from uresnet_tpu.data.events import SparseEvent, write_events, read_events  # noqa: F401
from uresnet_tpu.data.pipeline import densify_batch  # noqa: F401
