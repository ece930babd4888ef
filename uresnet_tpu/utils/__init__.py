from uresnet_tpu.utils.prng import key_seq, split_like  # noqa: F401
from uresnet_tpu.utils.dtypes import canonical_dtype  # noqa: F401
