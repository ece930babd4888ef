from uresnet_tpu.models.uresnet import uresnet_init, uresnet_apply  # noqa: F401
