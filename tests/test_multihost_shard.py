"""Multi-host input sharding: per-host loaders with shard=(r, n) must jointly
reproduce the single-host event stream (SURVEY.md §2.3 sharded input
pipeline). True multi-process SPMD can't run in CI; this validates the
sharding math single-process."""

import numpy as np

from uresnet_tpu.config import DataConfig
from uresnet_tpu.data.loader import BatchLoader
from uresnet_tpu.data.synthetic import generate_file


def _cfg(path, batch):
    return DataConfig(image_size=64, batch_size=batch, planes=(0,),
                      input_files=(path,), synthetic=False,
                      random_access=False, transfer="sparse", max_points=512)


def test_shards_partition_events(tmp_path):
    path = generate_file(str(tmp_path / "s.usef"), 8, seed=2,
                         shape=(128, 128), planes=(0,))
    full = BatchLoader(_cfg(path, 4), num_class=3)
    h0 = BatchLoader(_cfg(path, 4), num_class=3, shard=(0, 2))
    h1 = BatchLoader(_cfg(path, 4), num_class=3, shard=(1, 2))

    # each host produces half the global batch rows
    b_full = full._make_batch()
    b0 = h0._make_batch()
    b1 = h1._make_batch()
    assert b_full["values"].shape[0] == 4
    assert b0["values"].shape[0] == 2 and b1["values"].shape[0] == 2

    # hosts see disjoint event subsets that together cover the file:
    # full batch 1 = events 0..3; host0 = events 0,2; host1 = events 1,3
    def sig(b):
        return {tuple(np.asarray(b["values"][i][:8])) for i in
                range(b["values"].shape[0])}

    assert sig(b0) | sig(b1) == sig(b_full)
    assert not (sig(b0) & sig(b1))


def test_cxx_shard_matches_python(tmp_path):
    from uresnet_tpu.data import cxx_decoder

    if not cxx_decoder.available():
        import pytest

        pytest.skip("liburesnet_decoder.so not built — run `make -C cxx/decoder`")
    path = generate_file(str(tmp_path / "sc.usef"), 8, seed=4,
                         shape=(128, 128), planes=(0,))
    for rank in (0, 1):
        cfg = _cfg(path, 4)
        py = BatchLoader(cfg, num_class=3, shard=(rank, 2))
        cx = cxx_decoder.CxxBatchLoader(cfg, num_class=3,
                                        shard=(rank, 2)).start(1)
        a, b = py._make_batch(), cx.next()
        for k in ("coords", "values", "labels", "npoints", "shape"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"{k} r{rank}")
        cx.stop(); cx.close()


def test_shard_divisibility_error(tmp_path):
    path = generate_file(str(tmp_path / "s2.usef"), 6, seed=3,
                         shape=(128, 128), planes=(0,))
    import pytest

    with pytest.raises(ValueError, match="divisible"):
        BatchLoader(_cfg(path, 3), num_class=3, shard=(0, 2))
