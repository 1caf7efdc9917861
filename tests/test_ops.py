"""Unit tests for conv / batchnorm / spectral-norm primitives."""

import jax
import jax.numpy as jnp
import numpy as np

from hpvaegan_tpu.ops import (batchnorm_apply, batchnorm_init, conv2d_apply,
                              conv2d_init, conv3d_apply, conv3d_init,
                              sn_conv_apply, sn_conv_init)
from hpvaegan_tpu.ops.conv import reflect_pad
from hpvaegan_tpu.ops.spectral_norm import spectral_normalize


def test_conv2d_shapes_and_padding():
    key = jax.random.PRNGKey(0)
    p = conv2d_init(key, 3, 8, 3)
    x = jnp.ones((2, 16, 16, 3))
    y = conv2d_apply(p, x, padding=1)
    assert y.shape == (2, 16, 16, 8)
    y = conv2d_apply(p, x, padding=0)
    assert y.shape == (2, 14, 14, 8)


def test_conv3d_shapes():
    key = jax.random.PRNGKey(0)
    p = conv3d_init(key, 3, 4, 3)
    x = jnp.ones((1, 4, 8, 8, 3))
    y = conv3d_apply(p, x, padding=1)
    assert y.shape == (1, 4, 8, 8, 4)


def test_reflect_pad():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = reflect_pad(x, 1)
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(y[0, :, :, 0], np.pad(
        np.asarray(x)[0, :, :, 0], 1, mode="reflect"))


def test_batchnorm_train_normalizes():
    key = jax.random.PRNGKey(1)
    params, state = batchnorm_init(key, 5)
    params = {"gamma": jnp.ones((5,)), "beta": jnp.zeros((5,))}
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 5)) * 3.0 + 1.0
    y, new_state = batchnorm_apply(params, state, x, train=True)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, (0, 1, 2))), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.var(y, (0, 1, 2))), 1, atol=1e-3)
    # moving stats move toward batch stats with momentum 0.9
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               0.1 * np.asarray(jnp.mean(x, (0, 1, 2))), atol=1e-5)


def test_batchnorm_eval_uses_moving_stats():
    params = {"gamma": jnp.ones((3,)), "beta": jnp.zeros((3,))}
    state = {"mean": jnp.array([1.0, 2.0, 3.0]), "var": jnp.ones((3,))}
    x = jnp.zeros((1, 2, 2, 3))
    y, st = batchnorm_apply(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(y[0, 0, 0]), [-1, -2, -3], rtol=1e-4)
    assert st is state


def test_spectral_norm_scales_to_unit_sigma():
    key = jax.random.PRNGKey(3)
    params, state = sn_conv_init(key, 4, 6, 3, ndim=2)
    w = params["w"]
    # run a few power iterations to converge u,v
    for _ in range(50):
        w_bar, state = spectral_normalize(w, state)
    w_mat = np.asarray(w_bar.reshape(-1, w_bar.shape[-1])).T
    sigma = np.linalg.svd(w_mat, compute_uv=False)[0]
    np.testing.assert_allclose(sigma, 1.0, rtol=1e-3)


def test_sn_conv_apply_runs_and_updates_state():
    key = jax.random.PRNGKey(4)
    params, state = sn_conv_init(key, 3, 8, 3, ndim=2)
    x = jnp.ones((1, 8, 8, 3))
    y, new_state = sn_conv_apply(params, state, x, padding=1)
    assert y.shape == (1, 8, 8, 8)
    assert not np.allclose(np.asarray(new_state["u"]), np.asarray(state["u"]))


def test_sn_conv1d():
    # 1D spectral-norm conv (reference: spectral_norm.py:58-106)
    key = jax.random.PRNGKey(7)
    params, state = sn_conv_init(key, 2, 4, 3, ndim=1)
    x = jnp.ones((2, 10, 2))  # (B, W, C)
    y, ns = sn_conv_apply(params, state, x, padding=1)
    assert y.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_sn_grad_flows_through_sigma_not_uv():
    key = jax.random.PRNGKey(5)
    params, state = sn_conv_init(key, 2, 3, 3, ndim=2)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 6, 6, 2))

    def loss(p):
        y, _ = sn_conv_apply(p, state, x, padding=1)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g["w"])).all()
    assert float(jnp.abs(g["w"]).max()) > 0


def test_prelu_learnable_grad():
    """nn.PReLU parity (reference registry networks_2d.py:21): learnable
    shared slope, init 0.25, gradient flows to alpha."""
    import jax
    import jax.numpy as jnp

    from hpvaegan_tpu.ops.conv import activation, prelu_apply, prelu_init

    p = prelu_init()
    assert float(p["alpha"][0]) == 0.25
    x = jnp.array([-2.0, -1.0, 0.0, 1.0, 3.0])
    # at init, identical to the fixed-slope stand-in
    np.testing.assert_allclose(np.asarray(prelu_apply(p, x)),
                               np.asarray(activation(x, "prelu")))
    # activation() routes to the learnable path when params are given
    np.testing.assert_allclose(np.asarray(activation(x, "prelu", p)),
                               np.asarray(prelu_apply(p, x)))

    g = jax.grad(lambda pp: jnp.sum(prelu_apply(pp, x)))(p)
    # d/dalpha = sum of negative inputs = -3
    np.testing.assert_allclose(np.asarray(g["alpha"]), [-3.0], rtol=1e-6)


def test_conv_block_prelu_param():
    """conv_block_init(act='prelu') carries the learnable slope."""
    import jax

    from hpvaegan_tpu.models.blocks import conv_block_apply, conv_block_init

    p, s = conv_block_init(jax.random.PRNGKey(0), 3, 8, 3, ndim=2,
                           act="prelu")
    assert "act" in p
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 3))
    y, _ = conv_block_apply(p, s, x, padding=1, act="prelu", train=True)
    assert y.shape == (1, 8, 8, 8)
    g = jax.grad(lambda pp: float(0) + (conv_block_apply(
        pp, s, x, padding=1, act="prelu", train=True)[0] ** 2).sum())(p)
    assert float(np.abs(np.asarray(g["act"]["alpha"])).max()) > 0


def test_load_image01_grayscale(tmp_path):
    """Single-channel images must load as 3-channel (the reference's
    cv2.imread always yields 3 channels, so grayscale inputs trained fine
    there and must not crash here)."""
    import imageio.v2 as imageio
    import numpy as np

    from hpvaegan_tpu.data.image import load_image01

    gray = (np.arange(64, dtype=np.uint8).reshape(8, 8))
    path = str(tmp_path / "gray.png")
    imageio.imwrite(path, gray)
    img = load_image01(path)
    assert img.shape == (8, 8, 3)
    assert img.dtype == np.float32
    np.testing.assert_allclose(img[..., 0], img[..., 1])
