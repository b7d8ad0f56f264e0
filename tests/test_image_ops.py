import jax.numpy as jnp
import numpy as np

from street_crafter_tpu.ops.cubemap import sample_cubemap, latlong_from_cubemap
from street_crafter_tpu.ops.ssim import ssim, psnr, l1_loss


def test_cubemap_face_centers():
    # each face painted a constant color; looking down each axis returns it
    R = 8
    cm = np.zeros((6, R, R, 3), np.float32)
    for f in range(6):
        cm[f] = (f + 1) / 6.0
    cm = jnp.asarray(cm)
    dirs = jnp.asarray(np.array([
        [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1],
    ], np.float32))
    out = np.asarray(sample_cubemap(cm, dirs))
    for f in range(6):
        np.testing.assert_allclose(out[f], (f + 1) / 6.0, atol=1e-6)


def test_cubemap_bilinear_continuity(rng):
    R = 16
    cm = jnp.asarray(rng.uniform(size=(6, R, R, 3)).astype(np.float32))
    # two very close directions give very close colors
    d1 = jnp.asarray(np.array([[0.5, 0.3, 1.0]], np.float32))
    d2 = jnp.asarray(np.array([[0.5001, 0.3, 1.0]], np.float32))
    c1 = np.asarray(sample_cubemap(cm, d1))
    c2 = np.asarray(sample_cubemap(cm, d2))
    assert np.abs(c1 - c2).max() < 0.02


def test_cubemap_differentiable(rng):
    import jax
    R = 8
    cm = jnp.asarray(rng.uniform(size=(6, R, R, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))

    def loss(c):
        return jnp.sum(sample_cubemap(c, dirs) ** 2)

    g = jax.grad(loss)(cm)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_latlong_shape(rng):
    cm = jnp.asarray(rng.uniform(size=(6, 8, 8, 3)).astype(np.float32))
    ll = latlong_from_cubemap(cm, 16, 32)
    assert ll.shape == (16, 32, 3)
    assert np.isfinite(np.asarray(ll)).all()


def test_ssim_identity(rng):
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    assert float(ssim(img, img)) > 0.999


def test_ssim_decreases_with_noise(rng):
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    noisy = img + jnp.asarray(rng.normal(size=(32, 32, 3)).astype(np.float32)) * 0.2
    s = float(ssim(img, noisy))
    assert 0.0 < s < 0.9


def test_psnr():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)


def test_masked_l1():
    a = jnp.zeros((4, 4, 3))
    b = jnp.ones((4, 4, 3))
    mask = jnp.zeros((4, 4, 1)).at[0, 0].set(1.0)
    # masked mean over the single active pixel = 1.0
    np.testing.assert_allclose(float(l1_loss(a, b, mask)), 1.0, atol=1e-6)
