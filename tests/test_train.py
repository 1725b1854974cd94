"""End-to-end training: Trainer over DUMMY data, optimizer semantics,
checkpoint resume (SURVEY.md §4 implications (c))."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convnet_tpu import config, model as model_lib, optim
from convnet_tpu.data.datahandler import DataHandler
from convnet_tpu.graph import DECAY, OptimSpec, build_graph
from convnet_tpu.trainer import Trainer, init_state, make_train_step

SMALL_NET = """
name: "smoke"
seed: 3
batch_size: 32
max_iter: 30
display_after: 10
validate_after: 0
checkpoint_after: 0
layer { name: "input" is_input: true num_channels: 1 image_size: 12 }
layer { name: "conv1" num_channels: 4 activation: RECTIFIED_LINEAR }
layer { name: "pool1" num_channels: 4 }
layer { name: "output" is_output: true num_channels: 10 activation: SOFTMAX data_field: "labels" }
edge { source: "input" dest: "conv1" edge_type: CONV kernel_size: 3 stride: 1 padding: 1
       initialization: DENSE_GAUSSIAN init_wt: 0.1
       weight_optimizer { base_epsilon: 0.05 initial_momentum: 0.9 final_momentum: 0.9 }
       bias_optimizer { base_epsilon: 0.1 } }
edge { source: "conv1" dest: "pool1" edge_type: MAXPOOL kernel_size: 2 stride: 2 }
edge { source: "pool1" dest: "output" edge_type: FC
       initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0
       weight_optimizer { base_epsilon: 0.05 initial_momentum: 0.9 final_momentum: 0.9 }
       bias_optimizer { base_epsilon: 0.1 } }
"""

DATA_TMPL = """
name: "d"
batch_size: 32
randomize_cpu: true
pipeline_loads: {pipeline}
data_config {{ layer_name: "input" data_type: DUMMY image_size: 12 num_colors: 1
              scale: 0.0039215686 dummy_size: 256 }}
data_config {{ layer_name: "labels" data_type: DUMMY dummy_size: 256 dummy_num_classes: 10 }}
"""


def make_handler(pipeline="true", **kw):
    cfg = config.parse_dataset_config(DATA_TMPL.format(pipeline=pipeline))
    return DataHandler(cfg, **kw)


# ---------------------------------------------------------------------------
# optimizer semantics
# ---------------------------------------------------------------------------


def test_epsilon_schedules():
    t = jnp.asarray(100.0)
    assert float(optim.epsilon_at(OptimSpec(base_epsilon=0.1), t)) == pytest.approx(0.1)
    s = OptimSpec(base_epsilon=0.1, epsilon_decay=DECAY.INVERSE_T, epsilon_decay_timescale=100)
    assert float(optim.epsilon_at(s, t)) == pytest.approx(0.05)
    s = OptimSpec(base_epsilon=0.1, epsilon_decay=DECAY.EXPONENTIAL, epsilon_decay_timescale=100)
    assert float(optim.epsilon_at(s, t)) == pytest.approx(0.05)
    s = OptimSpec(base_epsilon=0.1, epsilon_decay=DECAY.LINEAR, epsilon_decay_timescale=200)
    assert float(optim.epsilon_at(s, t)) == pytest.approx(0.05)
    assert float(optim.epsilon_at(s, jnp.asarray(400.0))) == 0.0


def test_momentum_ramp():
    s = OptimSpec(initial_momentum=0.5, final_momentum=0.9, momentum_transition_timescale=100)
    assert float(optim.momentum_at(s, jnp.asarray(0.0))) == pytest.approx(0.5)
    assert float(optim.momentum_at(s, jnp.asarray(50.0))) == pytest.approx(0.7)
    assert float(optim.momentum_at(s, jnp.asarray(1000.0))) == pytest.approx(0.9)


def test_sgd_update_rule_exact():
    # inc = mom*inc - eps*(grad + l2*w); w += inc  (cuda-convnet semantics)
    m = config.parse_model(
        """
        name: "one"
        layer { name: "input" is_input: true num_channels: 2 }
        layer { name: "output" is_output: true num_channels: 2 loss_function: SQUARED_ERROR }
        edge { source: "input" dest: "output" edge_type: FC initialization: CONSTANT init_wt: 0.5
               weight_optimizer { base_epsilon: 0.1 initial_momentum: 0.8 final_momentum: 0.8 l2_decay: 0.01 }
               bias_optimizer { base_epsilon: 0.2 } }
        """
    )
    g = build_graph(m)
    params = model_lib.init_params(g)
    moms = optim.init_momentum(params)
    moms["input:output"]["w"] = jnp.full_like(params["input:output"]["w"], 0.3)
    grads = jax.tree.map(jnp.ones_like, params)
    new_p, new_m = optim.apply_updates(g, params, moms, grads, jnp.asarray(5, jnp.int32))
    w = 0.5
    expected_inc = 0.8 * 0.3 - 0.1 * (1.0 + 0.01 * w)
    np.testing.assert_allclose(
        np.asarray(new_m["input:output"]["w"]), expected_inc, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_p["input:output"]["w"]), w + expected_inc, rtol=1e-6
    )


def test_start_optimization_after_freezes():
    m = config.parse_model(
        """
        name: "frozen"
        layer { name: "input" is_input: true num_channels: 2 }
        layer { name: "output" is_output: true num_channels: 2 loss_function: SQUARED_ERROR }
        edge { source: "input" dest: "output" edge_type: FC initialization: CONSTANT init_wt: 0.5
               weight_optimizer { base_epsilon: 0.1 start_optimization_after: 10 }
               bias_optimizer { base_epsilon: 0.1 start_optimization_after: 10 } }
        """
    )
    g = build_graph(m)
    params = model_lib.init_params(g)
    moms = optim.init_momentum(params)
    grads = jax.tree.map(jnp.ones_like, params)
    p5, _ = optim.apply_updates(g, params, moms, grads, jnp.asarray(5, jnp.int32))
    p15, _ = optim.apply_updates(g, params, moms, grads, jnp.asarray(15, jnp.int32))
    np.testing.assert_array_equal(
        np.asarray(p5["input:output"]["w"]), np.asarray(params["input:output"]["w"])
    )
    assert not np.array_equal(
        np.asarray(p15["input:output"]["w"]), np.asarray(params["input:output"]["w"])
    )


def test_max_norm_constraint():
    spec = OptimSpec(base_epsilon=0.0, weight_norm_limit=1.0)
    w = jnp.full((4, 3), 2.0)  # column norm 4 > 1
    new_w, _ = optim._update_leaf(spec, w, jnp.zeros_like(w), jnp.zeros_like(w), jnp.asarray(0.0))
    norms = np.sqrt((np.asarray(new_w) ** 2).sum(axis=0))
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# end-to-end training
# ---------------------------------------------------------------------------


def test_train_step_reduces_loss_on_learnable_data():
    """Labels derived from the input -> loss must drop well below chance."""
    g = build_graph(config.parse_model(SMALL_NET))
    state = init_state(g)
    step = make_train_step(g)
    rng = np.random.RandomState(0)
    x = rng.randn(64, 12, 12, 1).astype(np.float32)
    labels = (x.mean(axis=(1, 2, 3)) > 0).astype(np.int32)  # 2 classes in 10
    batch = {"input": jnp.asarray(x), "labels": jnp.asarray(labels)}
    losses = []
    for _ in range(60):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.35, f"loss failed to drop: {losses[-1]:.3f} (start {losses[0]:.3f})"


def test_unrolled_step_matches_sequential():
    """make_train_step(unroll=k) scanning k stacked batches must equal k
    sequential single-step launches exactly — same per-step RNG (folded
    from the step counter), same state, metrics stacked per inner step."""
    g = build_graph(config.parse_model(SMALL_NET))
    rng = np.random.RandomState(4)
    batches = [
        {
            "input": jnp.asarray(rng.randn(32, 12, 12, 1).astype(np.float32)),
            "labels": jnp.asarray(rng.randint(0, 10, (32,), dtype=np.int32)),
        }
        for _ in range(3)
    ]
    state_a = init_state(g)
    step1 = make_train_step(g)
    losses_seq = []
    for b in batches:
        state_a, m = step1(state_a, b)
        losses_seq.append(float(m["loss"]))
    state_b = init_state(g)
    step3 = make_train_step(g, unroll=3)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    state_b, ms = step3(state_b, stacked)
    assert ms["loss"].shape == (3,)
    np.testing.assert_allclose(np.asarray(ms["loss"]), losses_seq, rtol=1e-6)
    assert int(state_b["step"]) == int(state_a["step"]) == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=1e-6, atol=1e-7
        ),
        state_a["params"],
        state_b["params"],
    )


def test_trainer_steps_per_launch_matches_single(tmp_path):
    """Trainer(steps_per_launch=3) over a deterministic DUMMY stream
    must land on the same params as the per-step Trainer — including a
    tail launch (13 % 3 != 0) — and still
    fire display at the first launch boundary past each multiple."""
    final = {}
    logs = {}
    for k in (1, 3):
        lines = []
        tr = Trainer(
            build_graph(config.parse_model(SMALL_NET)),
            make_handler(pipeline="false"),
            checkpoint_dir=str(tmp_path / f"k{k}"),
            log_fn=lines.append,
            steps_per_launch=k,
        )
        state = tr.train(max_iter=13)
        final[k] = jax.device_get(state["params"])
        logs[k] = lines
        tr.train_data.close()
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        final[1],
        final[3],
    )
    assert any("loss" in ln for ln in logs[3])


def test_trainer_checkpoint_cadence_under_unroll(tmp_path):
    """Cadence semantics under steps_per_launch (docs/api.md): with
    checkpoint_after=10 and k=4, saves fire at the first LAUNCH BOUNDARY
    at or past each multiple — steps 12 and 20 over a 24-step run, never
    mid-launch. (The reference fires at exact multiples; k=1 keeps that.)"""
    from convnet_tpu import checkpoint as ckpt

    m = config.parse_model(SMALL_NET)
    m.checkpoint_after = 10
    tr = Trainer(
        build_graph(m),
        make_handler(pipeline="false"),
        checkpoint_dir=str(tmp_path),
        log_fn=lambda *_: None,
        steps_per_launch=4,
    )
    tr.train(max_iter=24)
    tr.train_data.close()
    saved_steps = sorted(
        ckpt.load(os.path.join(tmp_path, f))[2]
        for f in os.listdir(tmp_path)
        if f.endswith(".h5")
    )
    assert saved_steps == [12, 20], saved_steps


@pytest.mark.parametrize("pipeline", ["true", "false"])
def test_trainer_e2e_dummy(tmp_path, pipeline):
    g = build_graph(config.parse_model(SMALL_NET))
    train_data = make_handler(pipeline, seed=1)
    val_data = make_handler("false", randomize=False)
    logs = []
    tr = Trainer(g, train_data, val_data, checkpoint_dir=str(tmp_path), log_fn=logs.append)
    tr.train(max_iter=12)
    assert int(tr.state["step"]) == 12
    verr, vloss = tr.validate(num_batches=2)
    assert np.isfinite(vloss) and 0.0 <= verr <= 1.0
    train_data.close()
    val_data.close()


def test_trainer_checkpoint_resume(tmp_path):
    g = build_graph(config.parse_model(SMALL_NET))
    train_data = make_handler("false", seed=2)
    tr = Trainer(g, train_data, checkpoint_dir=str(tmp_path), log_fn=lambda *_: None)
    tr.train(max_iter=5)
    path = tr.save()
    assert os.path.exists(path)
    w_before = np.asarray(tr.state["params"]["input:conv1"]["w"])

    tr2 = Trainer(g, train_data, checkpoint_dir=str(tmp_path), log_fn=lambda *_: None)
    assert int(tr2.state["step"]) == 5
    np.testing.assert_array_equal(
        np.asarray(tr2.state["params"]["input:conv1"]["w"]), w_before
    )
    # momentum restored too
    np.testing.assert_array_equal(
        np.asarray(tr2.state["moms"]["input:conv1"]["w"]),
        np.asarray(tr.state["moms"]["input:conv1"]["w"]),
    )
    tr2.train(max_iter=8)
    assert int(tr2.state["step"]) == 8
    train_data.close()


def test_datahandler_alignment_and_epochs():
    """Image and label streams must stay aligned through shuffling."""
    cfg = config.parse_dataset_config(
        """
        name: "align"
        batch_size: 16
        randomize_cpu: true
        pipeline_loads: false
        data_config { layer_name: "input" data_type: DUMMY image_size: 4 num_colors: 1 dummy_size: 64 }
        data_config { layer_name: "labels" data_type: DUMMY dummy_size: 64 dummy_num_classes: 10 }
        """
    )
    dh = DataHandler(cfg, seed=0)
    seen_labels = []
    for _ in range(4 * 3):  # 3 epochs
        b = dh.get_batch()
        assert b["input"].shape == (16, 4, 4, 1)
        assert b["labels"].shape == (16,)
        seen_labels.append(b["labels"])
    # across one epoch every row appears exactly once
    epoch = np.concatenate(seen_labels[:4])
    ref = dh.streams["labels"].read_rows(np.arange(64))
    assert sorted(epoch.tolist()) == sorted(ref.tolist())


def test_profile_trace_capture(tmp_path):
    """--profile-dir captures a tensorboard-readable trace (SURVEY §5.1)."""
    g = build_graph(config.parse_model(SMALL_NET))
    td = make_handler("false", seed=3)
    tr = Trainer(g, td, checkpoint_dir=None, log_fn=lambda *_: None)
    prof = str(tmp_path / "prof")
    tr.train(max_iter=20, profile_dir=prof)
    td.close()
    import glob

    traces = glob.glob(os.path.join(prof, "**", "*.trace.json.gz"), recursive=True) + \
        glob.glob(os.path.join(prof, "**", "*.xplane.pb"), recursive=True)
    assert traces, f"no trace files under {prof}"


def test_trainer_rejects_missing_stream():
    g = build_graph(config.parse_model(SMALL_NET))
    cfg = config.parse_dataset_config(
        """
        name: "incomplete"
        batch_size: 32
        pipeline_loads: false
        data_config { layer_name: "input" data_type: DUMMY image_size: 12 num_colors: 1 dummy_size: 64 }
        """
    )
    dh = DataHandler(cfg)
    with pytest.raises(ValueError, match="missing.*labels"):
        Trainer(g, dh, log_fn=lambda *_: None)
    dh.close()


def test_augmentation_replay_across_resume(tmp_path):
    """Resume must replay the identical augmentation stream (VERDICT r2
    weak #9): 3 steps + checkpoint save/load + 3 steps equals 6 straight
    steps on the same batches, bit-for-bit — the jitter rng is derived
    from (state rng, step, crc32(field)), all of which survive a resume."""
    from convnet_tpu import checkpoint as ckpt
    from convnet_tpu.data.jitter import JitterSpec

    g = build_graph(config.parse_model(SMALL_NET))
    jitter = {
        "input": (
            JitterSpec(image_size=12, can_translate=True, can_flip=True, scale=1 / 255),
            None,
            None,
        )
    }
    step = make_train_step(g, jitter)
    rng = np.random.RandomState(7)
    batches = [
        {
            "input": jnp.asarray(rng.randint(0, 256, (32, 16, 16, 1)).astype(np.uint8)),
            "labels": jnp.asarray(rng.randint(0, 10, (32,)).astype(np.int32)),
        }
        for _ in range(6)
    ]
    sA = init_state(g)
    for b in batches:
        sA, _ = step(sA, b)

    sB = init_state(g)
    for b in batches[:3]:
        sB, _ = step(sB, b)
    path = ckpt.save(
        str(tmp_path), "aug", jax.device_get(sB["params"]),
        jax.device_get(sB["moms"]), step=int(sB["step"]),
    )
    params, moms, st = ckpt.load(path)
    sC = init_state(g)
    sC["params"] = jax.tree.map(jnp.asarray, params)
    sC["moms"] = jax.tree.map(jnp.asarray, moms)
    sC["step"] = jnp.asarray(st, jnp.int32)
    for b in batches[3:]:
        sC, _ = step(sC, b)
    for e in sA["params"]:
        np.testing.assert_array_equal(
            np.asarray(sA["params"][e]["w"]), np.asarray(sC["params"][e]["w"])
        )


def test_save_timestamp_tag_resolves_under_collision(tmp_path):
    """Rapid saves collide on the second-resolution timestamp and get a
    "_1" suffix; the tag recorded in the rewritten pbtxt must still
    resolve to the real checkpoint file (round-2 defect: rsplit("_")
    recorded just "1")."""
    from convnet_tpu import checkpoint as ckpt

    proto = config.parse_model(SMALL_NET)
    g = build_graph(proto)
    dh = make_handler("false")
    tr = Trainer(g, dh, checkpoint_dir=str(tmp_path), log_fn=lambda *_: None,
                 model_proto=proto)
    saw_collision = False
    for _ in range(3):
        path = tr.save()
        m = config.read_model(os.path.join(str(tmp_path), f"{g.name}.pbtxt"))
        assert ckpt.checkpoint_path(str(tmp_path), g.name, m.timestamp) == path
        saw_collision = saw_collision or "_" in os.path.basename(path).removeprefix(f"{g.name}_")
    assert saw_collision, "3 rapid saves should hit at least one same-second collision"
    dh.close()
