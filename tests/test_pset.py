from uresnet_tpu.config import DataConfig
from uresnet_tpu.data.pset_compat import apply_pset_io_config, parse_pset

SAMPLE = """
# reference-style larcv ThreadProcessor config
ThreadProcessor: {
  Verbosity:       2
  NumThreads:      6
  NumBatchStorage: 8
  RandomAccess:    true
  InputFiles:      ["train0.root", "train1.root"]
  ProcessName:     ["train_image","train_label","train_weight"]
  ProcessType:     ["BatchFillerImage2D","BatchFillerImage2D","BatchFillerImage2D"]
  ProcessList: {
    train_image:  { ImageProducer: "wire",    Channels: [2] }
    train_label:  { ImageProducer: "segment", Channels: [2] }
    train_weight: { ImageProducer: "weight",  Channels: [0, 1] }
  }
}
"""


def test_parse_pset_structure():
    p = parse_pset(SAMPLE)
    tp = p["ThreadProcessor"]
    assert tp["NumThreads"] == 6
    assert tp["RandomAccess"] is True
    assert tp["InputFiles"] == ["train0.root", "train1.root"]
    assert tp["ProcessList"]["train_image"]["ImageProducer"] == "wire"
    assert tp["ProcessList"]["train_weight"]["Channels"] == [0, 1]


def test_apply_pset(tmp_path):
    f = tmp_path / "io.cfg"
    f.write_text(SAMPLE)
    cfg = DataConfig()
    apply_pset_io_config(str(f), cfg)
    assert cfg.num_threads == 6
    assert cfg.num_batch_storage == 8
    assert cfg.random_access is True
    assert cfg.input_files == ("train0.root", "train1.root")
    assert cfg.planes == (0, 1, 2)
    assert cfg.synthetic is False


def test_root_to_usef_substitution(tmp_path):
    (tmp_path / "x.usef").write_bytes(b"")
    f = tmp_path / "io.cfg"
    f.write_text('ThreadProcessor: { InputFiles: ["%s/x.root"] }' % tmp_path)
    cfg = DataConfig()
    apply_pset_io_config(str(f), cfg)
    assert cfg.input_files == (str(tmp_path / "x.usef"),)


def test_numbers_and_comments():
    p = parse_pset("A: { B: 1.5 C: -3 D: hello // note\n E: [1,2,3] }")
    assert p["A"]["B"] == 1.5 and p["A"]["C"] == -3
    assert p["A"]["D"] == "hello"
    assert p["A"]["E"] == [1, 2, 3]
