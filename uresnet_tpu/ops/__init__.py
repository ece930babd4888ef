from uresnet_tpu.ops.conv import conv, conv_transpose, conv_init  # noqa: F401
from uresnet_tpu.ops.norm import batch_norm, bn_init  # noqa: F401
