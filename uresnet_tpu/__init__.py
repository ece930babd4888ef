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
