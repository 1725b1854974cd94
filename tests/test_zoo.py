"""Model zoo constructors compile and have the documented geometry."""

import pytest

from convnet_tpu import models


@pytest.mark.parametrize(
    "ctor", [models.mnist_lenet, models.cifar10, models.cifar10_local,
             models.alexnet, models.alexnet_local, models.alexnet_2tower],
)
def test_zoo_builds(ctor):
    g = ctor()
    assert g.input_layers and g.output_layers


def test_cifar_local_geometry():
    g = models.cifar10_local()
    assert g.shapes["pool2"] == (8, 8, 64)
    assert g.shapes["local3"] == (8, 8, 64)
    assert g.shapes["local4"] == (8, 8, 32)


def test_alexnet_resizable():
    g = models.alexnet(image_size=67)
    assert g.shapes["pool5"] == (1, 1, 256)


def test_predictor_aot_and_partial_batch(tmp_path):
    import numpy as np

    from convnet_tpu import config, model as model_lib
    from convnet_tpu.graph import build_graph
    from convnet_tpu.predictor import Predictor

    g = build_graph(config.parse_model(
        """
        name: "p"
        layer { name: "input" is_input: true num_channels: 2 image_size: 6 }
        layer { name: "h" num_channels: 8 activation: RECTIFIED_LINEAR }
        layer { name: "output" is_output: true num_channels: 4 activation: SOFTMAX data_field: "labels" }
        edge { source: "input" dest: "h" edge_type: CONV kernel_size: 3 stride: 1 padding: 1
               initialization: DENSE_GAUSSIAN init_wt: 0.2 }
        edge { source: "h" dest: "output" edge_type: FC initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0 }
        """
    ))
    params = model_lib.init_params(g)
    p = Predictor(g, params, batch_size=8)
    rng = np.random.RandomState(0)
    x5 = rng.randn(5, 6, 6, 2).astype(np.float32)
    out = p({"input": x5})
    assert out["output"].shape == (5, 1, 1, 4)
    labels = p.predict_labels({"input": x5})
    assert labels.shape == (5,)
    # padded rows must not affect real rows: full batch agrees
    x8 = np.concatenate([x5, rng.randn(3, 6, 6, 2).astype(np.float32)])
    out8 = p({"input": x8})
    np.testing.assert_allclose(out8["output"][:5], out["output"], rtol=1e-5)
    import pytest

    with pytest.raises(ValueError, match="exceeds compiled"):
        p({"input": rng.randn(9, 6, 6, 2).astype(np.float32)})


def test_timer_accumulates():
    import time as _time

    from convnet_tpu.utils import Timer

    t = Timer()
    with t:
        _time.sleep(0.01)
    with t:
        _time.sleep(0.01)
    assert t.count == 2
    assert 0.005 < t.mean < 1.0
    assert t.total >= 0.02


def test_predictor_raw_size_center_crop():
    """raw_size compiles the eval prologue at the raw shape: shipping a
    raw image equals center-cropping on the client first."""
    import numpy as np

    from convnet_tpu import config, model as model_lib
    from convnet_tpu.data.jitter import JitterSpec
    from convnet_tpu.graph import build_graph
    from convnet_tpu.predictor import Predictor

    g = build_graph(config.parse_model(
        """
        name: "praw"
        layer { name: "input" is_input: true num_channels: 3 image_size: 8 }
        layer { name: "h" num_channels: 8 activation: RECTIFIED_LINEAR }
        layer { name: "output" is_output: true num_channels: 4 activation: SOFTMAX data_field: "labels" }
        edge { source: "input" dest: "h" edge_type: CONV kernel_size: 3 stride: 1 padding: 1
               initialization: DENSE_GAUSSIAN init_wt: 0.2 }
        edge { source: "h" dest: "output" edge_type: FC initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0 }
        """
    ))
    params = model_lib.init_params(g)
    mean = np.full((3,), 0.4, np.float32)
    jit = {"input": (JitterSpec(image_size=8, scale=1 / 255), mean, None)}

    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (4, 12, 12, 3)).astype(np.uint8)

    p_raw = Predictor(g, params, batch_size=4, jitter=jit, raw_size=12,
                      input_dtype=np.uint8)
    out_raw = p_raw({"input": raw})["output"]

    p_crop = Predictor(g, params, batch_size=4, jitter=jit)
    cropped = raw[:, 2:10, 2:10, :]  # center crop 12 -> 8
    out_crop = p_crop({"input": cropped})["output"]
    np.testing.assert_allclose(out_raw, out_crop, rtol=2e-5, atol=1e-6)

    import pytest

    with pytest.raises(ValueError, match="raw_size"):
        Predictor(g, params, batch_size=4, jitter=jit, raw_size=4)
    with pytest.raises(ValueError, match="jitter"):
        Predictor(g, params, batch_size=4, raw_size=12)


def test_predictor_rejects_float_input_when_compiled_uint8():
    """A uint8-compiled Predictor must reject float batches instead of
    silently wrapping out-of-range values (300.0 -> 44)."""
    import numpy as np
    import pytest

    from convnet_tpu import config, model as model_lib
    from convnet_tpu.data.jitter import JitterSpec
    from convnet_tpu.graph import build_graph
    from convnet_tpu.predictor import Predictor

    g = build_graph(config.parse_model(
        """
        name: "pu8"
        layer { name: "input" is_input: true num_channels: 3 image_size: 8 }
        layer { name: "output" is_output: true num_channels: 4 activation: SOFTMAX data_field: "labels" }
        edge { source: "input" dest: "output" edge_type: FC initialization: DENSE_GAUSSIAN init_wt: 0.1 }
        """
    ))
    params = model_lib.init_params(g)
    jit = {"input": (JitterSpec(image_size=8, scale=1 / 255), None, None)}
    p = Predictor(g, params, batch_size=4, jitter=jit, raw_size=12, input_dtype=np.uint8)
    with pytest.raises(TypeError, match="uint8"):
        p({"input": np.random.rand(4, 12, 12, 3).astype(np.float32)})


def test_predictor_uint8_without_jitter_casts_on_device():
    """input_dtype=uint8 with NO jitter map must still compile a uint8
    wire format (widened to f32 on device) and agree with the f32
    Predictor fed the same byte values — it used to be silently ignored
    so the program still demanded 4x the host->device bytes."""
    import numpy as np

    from convnet_tpu import config, model as model_lib
    from convnet_tpu.graph import build_graph
    from convnet_tpu.predictor import Predictor

    g = build_graph(config.parse_model(
        """
        name: "pu8nj"
        layer { name: "input" is_input: true num_channels: 3 image_size: 8 }
        layer { name: "output" is_output: true num_channels: 4 activation: SOFTMAX data_field: "labels" }
        edge { source: "input" dest: "output" edge_type: FC initialization: DENSE_GAUSSIAN init_wt: 0.01 }
        """
    ))
    params = model_lib.init_params(g)
    rng = np.random.RandomState(7)
    xb = rng.randint(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    p8 = Predictor(g, params, batch_size=4, input_dtype=np.uint8)
    # the compiled program's input really is uint8 over the wire
    import jax

    in_dtypes = [a.dtype for a in jax.tree.leaves(p8._compiled.in_avals)]
    assert any(dt == np.uint8 for dt in in_dtypes), in_dtypes
    pf = Predictor(g, params, batch_size=4)
    np.testing.assert_allclose(
        p8({"input": xb})["output"],
        pf({"input": xb.astype(np.float32)})["output"],
        rtol=1e-5,
        atol=1e-6,
    )


def test_predictor_uint8_multi_input_keeps_float_aux():
    """With a jitter map, input_dtype=uint8 applies only to the jittered
    (image) fields: auxiliary inputs outside the map keep a float32 wire
    format, so float-valued aux features neither raise nor silently wrap
    through uint8 (ADVICE r3: value 300 -> 44)."""
    import numpy as np
    import pytest

    from convnet_tpu import config, model as model_lib
    from convnet_tpu.data.jitter import JitterSpec
    from convnet_tpu.graph import build_graph
    from convnet_tpu.predictor import Predictor

    g = build_graph(config.parse_model(
        """
        name: "paux"
        layer { name: "img" is_input: true num_channels: 3 image_size: 8 }
        layer { name: "side" is_input: true num_channels: 8 data_field: "side" }
        layer { name: "h" num_channels: 8 activation: TANH }
        layer { name: "output" is_output: true num_channels: 3 activation: SOFTMAX data_field: "labels" }
        edge { source: "img" dest: "h" edge_type: FC initialization: DENSE_GAUSSIAN init_wt: 0.05 }
        edge { source: "side" dest: "h" edge_type: FC initialization: DENSE_GAUSSIAN init_wt: 0.05 }
        edge { source: "h" dest: "output" edge_type: FC initialization: DENSE_GAUSSIAN init_wt: 0.05 }
        """
    ))
    params = model_lib.init_params(g)
    img_field = next(l.data_field for l in g.input_layers if l.name == "img")
    jit = {img_field: (JitterSpec(image_size=8, scale=1 / 255), None, None)}

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    # float aux features with values far outside 0..255 — must ride f32
    side = (rng.randn(2, 1, 1, 8) * 300).astype(np.float32)

    p8 = Predictor(g, params, batch_size=2, jitter=jit, input_dtype=np.uint8)
    out8 = p8({img_field: img, "side": side})["output"]

    pf = Predictor(g, params, batch_size=2, jitter=jit)
    outf = pf({img_field: img.astype(np.float32), "side": side})["output"]
    np.testing.assert_allclose(out8, outf, rtol=1e-5, atol=1e-6)

    # the image field still enforces the uint8 wire format...
    with pytest.raises(TypeError, match="uint8"):
        p8({img_field: img.astype(np.float32), "side": side})
    # ...including rejecting out-of-range integers (silent wrap: 300->44)
    with pytest.raises(TypeError, match="uint8"):
        p8({img_field: img.astype(np.int32) + 200, "side": side})


def test_alexnet_2tower_geometry():
    """The original two-tower AlexNet: identical layer geometry to the
    single-tower net, but conv2/4/5 weights hold per-tower input
    channels (num_groups: 2 — half the conv2/4/5 weight volume, like
    the reference's per-GPU towers)."""
    from convnet_tpu import model as model_lib

    g = models.alexnet_2tower()
    assert g.shapes == models.alexnet().shapes
    shapes = model_lib.param_shapes(g)
    assert shapes["pool1:conv2"]["w"] == (5, 5, 48, 256)
    assert shapes["conv3:conv4"]["w"] == (3, 3, 192, 384)
    assert shapes["conv4:conv5"]["w"] == (3, 3, 192, 256)
    assert shapes["pool2:conv3"]["w"] == (3, 3, 256, 384)  # full cross-tower
    assert g.parallel_model == 2  # towers map onto the mesh's model axis
