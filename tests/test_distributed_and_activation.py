"""Multi-host helper (single-host behavior) + activation option."""

import jax
import jax.numpy as jnp
import numpy as np

from keras_object_detection_tpu.models.yolo import YoloV1
from keras_object_detection_tpu.parallel import distributed


def test_host_shard_single_host():
    assert distributed.host_shard() == (0, 1)


def test_maybe_initialize_single_host_noop():
    assert distributed.maybe_initialize() is False
    assert jax.process_count() == 1


def test_leaky_relu_activation_changes_output():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 56, 56, 3), jnp.float32)
    relu_m = YoloV1(backbone="darknet_micro", head="conv", num_classes=3,
                    compute_dtype=jnp.float32)
    leaky_m = YoloV1(backbone="darknet_micro", head="conv", num_classes=3,
                     activation="leaky_relu", compute_dtype=jnp.float32)
    v = relu_m.init(jax.random.PRNGKey(0), x, train=False)
    out_relu = relu_m.apply(v, x, train=False)
    out_leaky = leaky_m.apply(v, x, train=False)  # same params, diff activation
    assert out_relu.shape == out_leaky.shape == (1, 7, 7, 13)
    assert not np.allclose(np.asarray(out_relu), np.asarray(out_leaky))
