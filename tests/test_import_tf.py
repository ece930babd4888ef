"""TF1 checkpoint import (models/import_tf.py, tools/import_tf_ckpt.py).

The reference checkpoints via tf.train.Saver (SURVEY.md §5); the importer
brings those trained weights across. TF itself is absent here (and the
reference mount is empty), so these tests pin the two halves that ARE
decidable in this environment:

  * the layout/semantics transforms against their mathematical definitions
    (TF conv2d_transpose IS the gradient of a strided SAME conv — pinned
    via jax.vjp; the conv-bias -> BN folds are exact algebra, pinned
    numerically in both train and eval modes);
  * the unit matcher as an exact inverse: synthetic TF dumps built from a
    real `uresnet_init` tree by the inverse transforms (tf.layers numbered
    names, slim-style natural names, optimizer-slot noise, biased convs,
    scale-less BNs) must import back to the ORIGINAL tree bit-for-bit.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uresnet_tpu.config import Config, ModelConfig
from uresnet_tpu.engine.checkpoint import _path_str
from uresnet_tpu.models.import_tf import (
    TFImportError,
    format_report,
    map_tf_dump,
    tconv_kernel_from_tf,
    unit_sequence,
    write_import_checkpoint,
)
from uresnet_tpu.models.uresnet import uresnet_apply, uresnet_init
from uresnet_tpu.ops.conv import conv_general
from uresnet_tpu.ops.norm import batch_norm, bn_init


def tiny_model(depth=2, base=4, blocks=2, dims=2, in_ch=1, num_class=3):
    return ModelConfig(dims=dims, num_class=num_class, in_channels=in_ch,
                       base_filters=base, depth=depth,
                       blocks_per_level=blocks, compute_dtype="float32")


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dims", [2, 3])
def test_tconv_transform_matches_tf_gradient_semantics(dims):
    """TF conv2d_transpose(x, w_tf) is BY DEFINITION the gradient of a
    SAME strided conv with kernel w_tf (HWIO mapping big->small) w.r.t. its
    input. Our conv_transpose correlates an unflipped (k.., in, out) kernel;
    the importer's flip+swap must make the two identical."""
    rng = np.random.default_rng(0)
    k, s, cin, cout, S = 3, 2, 4, 5, 6 if dims == 2 else 4
    x = rng.standard_normal((2,) + (S,) * dims + (cin,)).astype(np.float32)
    w_tf = rng.standard_normal((k,) * dims + (cout, cin)).astype(np.float32)

    def fwd(a):  # conv mapping (2S..)^dims x cout -> (S..)^dims x cin
        return conv_general(a, jnp.asarray(w_tf), strides=s, padding="SAME",
                            dims=dims, compute_dtype=jnp.float32)

    a0 = jnp.zeros((2,) + (s * S,) * dims + (cout,), jnp.float32)
    _, vjp = jax.vjp(fwd, a0)
    y_tf, = vjp(jnp.asarray(x))

    y_ours = conv_general(jnp.asarray(x),
                          jnp.asarray(tconv_kernel_from_tf(w_tf)),
                          strides=s, padding="SAME", dims=dims,
                          compute_dtype=jnp.float32, kind="convt")
    np.testing.assert_allclose(np.asarray(y_tf), np.asarray(y_ours),
                               rtol=1e-5, atol=1e-5)


def test_tconv_transform_is_involution():
    w = np.random.default_rng(1).standard_normal((3, 3, 4, 6)).astype(np.float32)
    np.testing.assert_array_equal(
        tconv_kernel_from_tf(tconv_kernel_from_tf(w)), w)


@pytest.mark.parametrize("train", [True, False])
def test_conv_bias_fold_into_bn_mean_is_exact(train):
    """BN(z + b) with stored mean m  ==  BN(z) with stored mean m - b, in
    BOTH modes: eval applies the same affine; train's batch mean subtracts
    the bias right back out."""
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.standard_normal((4, 8, 8, 5)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(5).astype(np.float32))
    p, s = bn_init(5)
    p = {"scale": p["scale"] + 0.3, "bias": p["bias"] - 0.1}
    s = {"mean": jnp.asarray(rng.standard_normal(5).astype(np.float32)),
         "var": jnp.asarray(rng.random(5).astype(np.float32) + 0.5)}
    y_ref, _ = batch_norm(z + b, p, s, train=train)
    y_fold, _ = batch_norm(z, p, {"mean": s["mean"] - b, "var": s["var"]},
                           train=train)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fold),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# synthetic TF dumps (the inverse of the importer)
# ---------------------------------------------------------------------------


def make_tf_dump(params, state, cfg, *, style="numbered", conv_bias=None,
                 proj_bias=None, drop_gamma=()):
    """Build the TF-side dump a reference checkpoint of this net would
    contain, by applying the importer's transforms IN REVERSE.

    conv_bias: {unit_path_str: bias}  — emit a conv bias and shift the BN
        moving_mean up by it (the fold's inverse).
    proj_bias: {block_name: bias} — emit a proj bias and shift the block's
        cb2 beta down by it.
    drop_gamma: unit paths whose BN omits gamma/beta (TF scale=False).
    """
    conv_bias = conv_bias or {}
    proj_bias = proj_bias or {}
    dump = {}
    conv_i = tconv_i = bn_i = 0
    slim_i = 0

    def conv_scope(kind):
        nonlocal conv_i, tconv_i, slim_i
        if style == "numbered":
            base = "conv2d_transpose" if kind == "tconv" else "conv2d"
            i = tconv_i if kind == "tconv" else conv_i
            name = base if i == 0 else f"{base}_{i}"
            if kind == "tconv":
                tconv_i += 1
            else:
                conv_i += 1
            return name
        slim_i += 1
        tag = "deconv" if kind == "tconv" else "conv"
        return f"uresnet/m{slim_i:03d}_{tag}"

    def bn_scope(prev_scope):
        nonlocal bn_i
        if style == "numbered":
            name = ("batch_normalization" if bn_i == 0
                    else f"batch_normalization_{bn_i}")
            bn_i += 1
            return name
        return prev_scope + "/BatchNorm"

    def get(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    for group in unit_sequence(cfg):
        for u in group:
            path_str = "/".join(u.path)
            if u.bn:
                w = np.asarray(get(params, u.path + ("conv", "w")))
                bnp = get(params, u.path + ("bn",))
                bns = get(state, u.path + ("bn",))
                scope = conv_scope(u.kind)
                if u.kind == "tconv":
                    w = tconv_kernel_from_tf(w)  # involution: ours -> TF
                dump[f"{scope}/kernel"] = w
                mean = np.asarray(bns["mean"])
                if path_str in conv_bias:
                    b = conv_bias[path_str]
                    dump[f"{scope}/bias"] = b
                    mean = mean + b
                bscope = bn_scope(scope)
                if path_str not in drop_gamma:
                    dump[f"{bscope}/gamma"] = np.asarray(bnp["scale"])
                    dump[f"{bscope}/beta"] = np.asarray(bnp["bias"])
                dump[f"{bscope}/moving_mean"] = mean
                dump[f"{bscope}/moving_variance"] = np.asarray(bns["var"])
            else:
                unit = get(params, u.path)
                scope = conv_scope("conv")
                dump[f"{scope}/kernel"] = np.asarray(unit["w"])
                if u.own_bias:
                    dump[f"{scope}/bias"] = np.asarray(unit["b"])
                block = u.path[0]
                if u.path[-1] == "proj" and block in proj_bias:
                    dump[f"{scope}/bias"] = proj_bias[block]
    return dump


def add_optimizer_noise(dump):
    noisy = dict(dump)
    for name, arr in list(dump.items()):
        if name.endswith("kernel"):
            noisy[f"{name}/Adam"] = np.zeros_like(arr)
            noisy[f"{name}/Adam_1"] = np.zeros_like(arr)
    noisy["global_step"] = np.int64(12000)
    noisy["beta1_power"] = np.float32(0.81)
    noisy["beta2_power"] = np.float32(0.998)
    return noisy


def randomized_tree(cfg, seed=0):
    """uresnet_init with non-trivial BN params/stats so folds are visible."""
    params, state = uresnet_init(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed + 1)

    def jitter(tree):
        return jax.tree.map(
            lambda a: np.asarray(a)
            + rng.standard_normal(a.shape).astype(np.float32) * 0.1, tree)

    params = jitter(params)
    state = jax.tree.map(
        lambda a: np.abs(np.asarray(a)
                         + rng.standard_normal(a.shape).astype(np.float32)
                         * 0.1) + 0.1, state)
    return params, state


def assert_trees_equal(got, want, atol=0.0):
    g = {_path_str(p): np.asarray(l)
         for p, l in jax.tree_util.tree_flatten_with_path(got)[0]}
    w = {_path_str(p): np.asarray(l)
         for p, l in jax.tree_util.tree_flatten_with_path(want)[0]}
    assert set(g) == set(w)
    for k in w:
        np.testing.assert_allclose(g[k], w[k], atol=atol, rtol=0,
                                   err_msg=k)


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("style", ["numbered", "slim"])
def test_roundtrip_exact(style):
    cfg = tiny_model()
    params, state = randomized_tree(cfg)
    dump = add_optimizer_noise(make_tf_dump(params, state, cfg, style=style))
    # dict insertion order must not matter: shuffle
    items = list(dump.items())
    np.random.default_rng(3).shuffle(items)
    got_p, got_s, report = map_tf_dump(dict(items), cfg)
    assert_trees_equal(got_p, params)
    assert_trees_equal(got_s, state)
    assert len(report) == sum(len(g) for g in unit_sequence(cfg))
    assert "transform" in format_report(report)


def test_roundtrip_3d():
    cfg = tiny_model(dims=3, depth=1, base=2, blocks=1)
    params, state = randomized_tree(cfg, seed=5)
    dump = make_tf_dump(params, state, cfg)
    got_p, got_s, _ = map_tf_dump(dump, cfg)
    assert_trees_equal(got_p, params)
    assert_trees_equal(got_s, state)


def test_roundtrip_with_biases_and_missing_gamma():
    """Conv biases fold into BN means, proj biases into cb2 betas, and a
    scale-less BN gets gamma=1/beta=0 — all exactly recoverable."""
    cfg = tiny_model()
    params, state = randomized_tree(cfg, seed=7)
    # a scale-less BN must come back as ones/zeros: set the originals so
    params["down0"]["bn"]["scale"] = np.ones_like(
        np.asarray(params["down0"]["bn"]["scale"]))
    params["down0"]["bn"]["bias"] = np.zeros_like(
        np.asarray(params["down0"]["bn"]["bias"]))
    rng = np.random.default_rng(8)
    f1 = cfg.base_filters * 2
    cb = {"stem": rng.standard_normal(cfg.base_filters).astype(np.float32),
          "up1": rng.standard_normal(f1).astype(np.float32)}
    pb = rng.standard_normal(f1).astype(np.float32)
    # proj bias pb on dec1_b0 means the TF net's cb2 beta was (ours - pb)
    params_tf = jax.tree.map(np.asarray, params)
    params_tf["dec1_b0"]["cb2"]["bn"]["bias"] = (
        params_tf["dec1_b0"]["cb2"]["bn"]["bias"] - pb)
    dump = make_tf_dump(params_tf, state, cfg, conv_bias=cb,
                        proj_bias={"dec1_b0": pb}, drop_gamma=("down0",))
    got_p, got_s, report = map_tf_dump(dump, cfg)
    assert_trees_equal(got_p, params, atol=1e-6)
    assert_trees_equal(got_s, state, atol=1e-6)
    notes = {r[0]: r[2] for r in report}
    assert "folded into BN mean" in notes["stem"]
    assert "folded into cb2 BN beta" in notes["dec1_b0/proj"]


def test_spec_overlay_fixes_wrong_numbering():
    """Two same-shape convs swapped in the TF numbering import 'cleanly'
    but wrong; pinning them via --spec restores exactness."""
    cfg = tiny_model()
    params, state = randomized_tree(cfg, seed=9)
    dump = make_tf_dump(params, state, cfg)
    # enc0_b0 cb1 is conv2d_1, cb2 is conv2d_2 (stem is conv2d) — swap them
    swapped = dict(dump)
    swapped["conv2d_1/kernel"], swapped["conv2d_2/kernel"] = (
        dump["conv2d_2/kernel"], dump["conv2d_1/kernel"])
    got_p, _, _ = map_tf_dump(swapped, cfg)
    assert not np.allclose(np.asarray(got_p["enc0_b0"]["cb1"]["conv"]["w"]),
                           np.asarray(params["enc0_b0"]["cb1"]["conv"]["w"]))
    spec = {"enc0_b0/cb1": "conv2d_2", "enc0_b0/cb2": "conv2d_1"}
    got_p, got_s, _ = map_tf_dump(swapped, cfg, spec=spec)
    assert_trees_equal(got_p, params)
    assert_trees_equal(got_s, state)


def test_proj_position_is_shape_disambiguated():
    """A reference graph that built the 1x1 projection BEFORE the block's
    3x3 convs still imports exactly (shape matching within the group)."""
    cfg = tiny_model(depth=1, blocks=1)  # dec0_b0 has a proj
    params, state = randomized_tree(cfg, seed=11)
    dump = make_tf_dump(params, state, cfg)
    # construction order names: ... dec0_b0 -> cb1, cb2, proj are the last
    # three conv2d_N before no more convs except head
    names = [k for k in dump if k.endswith("/kernel")
             and "transpose" not in k]
    # reorder: give proj the EARLIER number by swapping names with cb1
    idx = {n: dump[n] for n in names}
    shapes = {n: a.shape for n, a in idx.items()}
    proj_name = next(n for n, s in shapes.items() if s[0] == 1)
    block_names = sorted(
        (n for n, s in shapes.items()
         if s == (3, 3, cfg.base_filters * 2, cfg.base_filters)),
        key=len)
    cb1_name = block_names[0]
    swapped = dict(dump)
    swapped[proj_name], swapped[cb1_name] = dump[cb1_name], dump[proj_name]
    got_p, got_s, _ = map_tf_dump(swapped, cfg)
    assert_trees_equal(got_p, params)
    assert_trees_equal(got_s, state)


# ---------------------------------------------------------------------------
# failure modes
# ---------------------------------------------------------------------------


def test_wrong_architecture_count_raises():
    cfg = tiny_model()
    params, state = randomized_tree(cfg)
    dump = make_tf_dump(params, state, cfg)
    with pytest.raises(TFImportError, match="needs"):
        map_tf_dump(dump, tiny_model(depth=3), )


def test_shape_mismatch_names_unit():
    cfg = tiny_model()
    params, state = randomized_tree(cfg)
    dump = make_tf_dump(params, state, cfg)
    dump["conv2d/kernel"] = dump["conv2d/kernel"][..., :2]
    with pytest.raises(TFImportError, match="stem"):
        map_tf_dump(dump, cfg)


def test_unknown_spec_scope_raises():
    cfg = tiny_model()
    params, state = randomized_tree(cfg)
    dump = make_tf_dump(params, state, cfg)
    with pytest.raises(TFImportError, match="unknown TF scope"):
        map_tf_dump(dump, cfg, spec={"stem": "nope/nothing"})


# ---------------------------------------------------------------------------
# end to end: written checkpoint restores and runs
# ---------------------------------------------------------------------------


def test_import_checkpoint_restores_and_forward_matches(tmp_path):
    from uresnet_tpu.engine.trainer import Trainer
    from uresnet_tpu.parallel.mesh import make_mesh

    cfg = Config()
    cfg.model = tiny_model()
    cfg.data.image_size = 16
    cfg.data.batch_size = 2
    cfg.train.checkpoint_dir = str(tmp_path / "ck")
    cfg.train.log_dir = str(tmp_path / "log")

    params, state = randomized_tree(cfg.model, seed=13)
    dump = make_tf_dump(params, state, cfg.model)
    path = write_import_checkpoint(str(tmp_path / "imported"),
                                   *map_tf_dump(dump, cfg.model)[:2],
                                   cfg.model)
    assert path.endswith("step_00000000.npz")

    cfg.train.load_file = path
    cfg.train.load_params_only = True
    tr = Trainer(cfg, mesh=make_mesh(1))
    ts, step, cursor = tr.restore()
    assert step == 0 and cursor == 0

    x = jnp.asarray(np.random.default_rng(14)
                    .random((2, 16, 16, 1)).astype(np.float32))
    got, _ = uresnet_apply(jax.tree.map(jnp.asarray, ts.params),
                           jax.tree.map(jnp.asarray, ts.model_state),
                           x, cfg=cfg.model, train=False)
    want, _ = uresnet_apply(jax.tree.map(jnp.asarray, params),
                            jax.tree.map(jnp.asarray, state),
                            x, cfg=cfg.model, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_convert_tool_cli(tmp_path):
    """The tools/import_tf_ckpt.py convert surface end to end (dump npz on
    disk -> checkpoint dir), including --report and --dry-run."""
    import importlib.util
    import io
    import os
    import sys
    from contextlib import redirect_stdout

    spec = importlib.util.spec_from_file_location(
        "import_tf_ckpt",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "import_tf_ckpt.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cfg = tiny_model()
    params, state = randomized_tree(cfg, seed=15)
    dump = add_optimizer_noise(make_tf_dump(params, state, cfg))
    dump_path = tmp_path / "vars.npz"
    np.savez(dump_path, **dump)
    cfg_path = tmp_path / "m.json"
    cfg_path.write_text(
        '{"model": {"depth": 2, "base_filters": 4, "blocks_per_level": 2,'
        ' "compute_dtype": "float32"}}')

    out = io.StringIO()
    with redirect_stdout(out):
        rc = mod.main(["convert", str(dump_path), str(tmp_path / "out"),
                       "--config", str(cfg_path), "--report", "--dry-run"])
    assert rc == 0
    assert "dry run" in out.getvalue()
    assert "stem" in out.getvalue()
    assert not (tmp_path / "out").exists()

    rc = mod.main(["convert", str(dump_path), str(tmp_path / "out"),
                   "--config", str(cfg_path)])
    assert rc == 0
    assert (tmp_path / "out" / "step_00000000.npz").exists()
