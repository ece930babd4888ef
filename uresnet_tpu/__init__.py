"""uresnet_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework for LArTPC semantic
segmentation, with the full capabilities of DeepLearnPhysics/u-resnet.

This is a brand-new idiomatic JAX design, not a port of the TF1 reference:
pure step functions over param pytrees, explicit PRNG, NHWC layout, named
device meshes with XLA collectives over ICI, a C++ data plane with
double-buffered host prefetch, and Pallas fused kernels where they beat XLA.

Blueprint: /root/repo/SURVEY.md (capability contract in §2; the reference
mount was empty, so structural anchors there are knowledge-based — see §0).
"""

__version__ = "0.1.0"

from uresnet_tpu.config import Config, load_config  # noqa: F401


def __getattr__(name):
    # Lazy top-level API (avoids importing jax for config-only users):
    #   uresnet_tpu.Trainer, .uresnet_init, .uresnet_apply, .make_mesh
    if name == "Trainer":
        from uresnet_tpu.engine.trainer import Trainer

        return Trainer
    if name in ("uresnet_init", "uresnet_apply"):
        import uresnet_tpu.models.uresnet as m

        return getattr(m, name)
    if name == "make_mesh":
        from uresnet_tpu.parallel.mesh import make_mesh

        return make_mesh
    raise AttributeError(name)
