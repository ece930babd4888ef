"""CLI argument-surface tests (no training): config resolution, override
interleaving, error paths."""

import subprocess
import sys

import pytest

from uresnet_tpu.cli import infer as infer_cli
from uresnet_tpu.cli import train as train_cli


def test_train_rejects_unknown_flag_like_token(capsys):
    with pytest.raises(SystemExit):
        train_cli.main(["--platform", "cpu", "--bogus-flag"])


def test_train_rejects_unknown_config_field():
    with pytest.raises(KeyError):
        train_cli.main(["--platform", "cpu", "bogus.field=1",
                        "--iterations", "0"])


def test_infer_missing_checkpoint_clean_error(tmp_path):
    with pytest.raises(FileNotFoundError) as e:
        infer_cli.main(["--platform", "cpu", "--metrics-only",
                        f"train.checkpoint_dir={tmp_path}/none"])
    assert "no checkpoint" in str(e.value)


def test_train_zero_iterations_smoke(tmp_path):
    """Full arg surface: config file + interleaved overrides + flags."""
    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        "model: {depth: 2, base_filters: 4, compute_dtype: float32}\n"
        "data: {image_size: 32, batch_size: 2, planes: [0], synthetic: true,"
        " synthetic_events: 4, num_threads: 1}\n"
        f"train: {{checkpoint_dir: {tmp_path}/ck, log_dir: {tmp_path}/lg,"
        " summary_iter: 1, checkpoint_iter: 0, val_iter: 0}\n")
    rc = train_cli.main([str(cfg), "--platform", "cpu", "optim.lr=1e-3",
                         "--iterations", "1", "SEED=5", "parallel.data=1"])
    assert rc == 0


def test_trainer_clear_error_on_indivisible_batch(tmp_path):
    """batch 2 on an 8-device data mesh must raise a clear message, not a
    cryptic sharding error (found driving the CLI)."""
    from uresnet_tpu.config import Config, DataConfig
    from uresnet_tpu.engine.trainer import Trainer

    cfg = Config(data=DataConfig(batch_size=2))
    with pytest.raises(ValueError) as e:
        Trainer(cfg)
    assert "divisible" in str(e.value) and "parallel.data" in str(e.value)


def test_event_display_smoke(tmp_path):
    """The visual-validation tool (SURVEY.md §4 'visual inspection')
    renders a three-panel PNG from a USEF file + checkpoint."""
    pytest.importorskip("matplotlib")
    import sys

    from uresnet_tpu.data.synthetic import generate_file

    sys.path.insert(0, ".")
    from tools.event_display import main as display_main

    path = generate_file(str(tmp_path / "d.usef"), 2, seed=5,
                         shape=(128, 128), planes=(0,))
    cfg = str(tmp_path / "cfg.yaml")
    with open(cfg, "w") as f:
        f.write(
            "model: {depth: 2, base_filters: 4, compute_dtype: float32}\n"
            "data: {image_size: 32, batch_size: 1, planes: [0]}\n"
            "parallel: {data: 1}\n"
            f"train: {{checkpoint_dir: {tmp_path}/ck, iterations: 2,\n"
            f"  summary_iter: 2, checkpoint_iter: 2, val_iter: 0,\n"
            f"  log_dir: {tmp_path}/lg}}\n")
    from uresnet_tpu.cli.train import main as train_main

    train_main([cfg, f"data.input_files={path}", "data.synthetic=false"])
    out = str(tmp_path / "disp.png")
    rc = display_main([cfg, f"data.input_files={path}",
                       "data.synthetic=false", "--input", path,
                       "--event", "1", "--out", out])
    assert not rc
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_event_display_3d_projections(tmp_path):
    """3D volumes render as a 3x3 max-charge-projection grid (one row per
    axis) — the visual-validation surface for BASELINE config 4."""
    pytest.importorskip("matplotlib")
    import os
    import sys

    from uresnet_tpu.data.synthetic import generate_file

    sys.path.insert(0, ".")
    from tools.event_display import main as display_main

    path = generate_file(str(tmp_path / "d3.usef"), 1, seed=6,
                         shape=(64, 64, 64), planes=(0,))
    cfg = str(tmp_path / "cfg3.yaml")
    with open(cfg, "w") as f:
        f.write(
            "model: {dims: 3, depth: 2, base_filters: 4,"
            " compute_dtype: float32}\n"
            "data: {image_size: 32, batch_size: 1, planes: [0]}\n"
            "parallel: {data: 1}\n"
            f"train: {{checkpoint_dir: {tmp_path}/ck3, iterations: 2,\n"
            f"  summary_iter: 2, checkpoint_iter: 2, val_iter: 0,\n"
            f"  log_dir: {tmp_path}/lg3}}\n")
    from uresnet_tpu.cli.train import main as train_main

    train_main([cfg, f"data.input_files={path}", "data.synthetic=false"])
    out = str(tmp_path / "disp3.png")
    rc = display_main([cfg, f"data.input_files={path}",
                       "data.synthetic=false", "--input", path,
                       "--event", "0", "--out", out])
    assert not rc
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_sigterm_checkpoints_and_resumes(tmp_path):
    """Preemption contract (SURVEY.md §5): SIGTERM during fit finishes the
    in-flight step, writes a checkpoint, exits rc=0; --resume continues
    from the saved step. checkpoint_iter=0 here so the ONLY possible
    checkpoint is the preemption one."""
    import os
    import signal
    import sys
    import time

    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        "model: {depth: 2, base_filters: 4, compute_dtype: float32}\n"
        "data: {image_size: 32, batch_size: 2, planes: [0], synthetic: true,"
        " synthetic_events: 8, num_threads: 1}\n"
        f"train: {{checkpoint_dir: {tmp_path}/ck, log_dir: {tmp_path}/lg,"
        " summary_iter: 1, checkpoint_iter: 0, val_iter: 0,"
        " iterations: 100000}\n")
    proc = subprocess.Popen(
        [sys.executable, "-m", "uresnet_tpu.cli.train", str(cfg),
         "--platform", "cpu", "parallel.data=1"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    csv = tmp_path / "lg" / "train_metrics.csv"
    try:
        deadline = time.time() + 300
        # wait until at least one step is logged (compile is the long pole)
        while time.time() < deadline:
            if csv.exists() and len(csv.read_text().splitlines()) >= 3:
                break
            if proc.poll() is not None:
                raise AssertionError(
                    f"train exited early rc={proc.returncode}:\n"
                    f"{proc.stdout.read()}")
            time.sleep(1.0)
        else:
            raise AssertionError("no training progress within 300s")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=240)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out
    assert "SIGTERM: checkpoint saved at step" in out, out
    cks = sorted(p.name for p in (tmp_path / "ck").glob("step_*.npz"))
    assert cks, out
    saved_step = int(cks[-1].split("_")[1].split(".")[0])

    # resume continues from the preemption checkpoint
    rc = train_cli.main([str(cfg), "--platform", "cpu", "--resume", "parallel.data=1",
                         "--iterations", "2"])
    assert rc == 0
    rows = (tmp_path / "lg" / "train_metrics.csv").read_text().splitlines()
    assert any(r.startswith(f"{saved_step + 2},") for r in rows[1:]), rows
