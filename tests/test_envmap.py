import numpy as np
import jax
import jax.numpy as jnp

from tpu_splat.envmap import (
    CubemapParams,
    init_cubemap,
    sample_cubemap,
    resize_cubemap,
    sharpen_cubemap,
)


def _params(L=8, C=3, seed=0):
    return init_cubemap(jax.random.PRNGKey(seed), C, L)


def test_constant_texture_everywhere():
    L = 8
    p = CubemapParams(
        texture=jnp.full((6, 3, L, L), 0.37), fail_value=jnp.zeros(3)
    )
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(256, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sample_cubemap(p, jnp.asarray(dirs))
    np.testing.assert_allclose(out, 0.37, atol=1e-6)


def test_face_lookup_axis():
    """+x axis hits face 0 center; per-face constant textures select faces."""
    L = 8
    tex = jnp.zeros((6, 1, L, L))
    for f in range(6):
        tex = tex.at[f].set(float(f + 1))
    p = CubemapParams(texture=tex, fail_value=jnp.zeros(1))
    axes = jnp.array(
        [
            [1.0, 0, 0],
            [-1.0, 0, 0],
            [0, 1.0, 0],
            [0, -1.0, 0],
            [0, 0, 1.0],
            [0, 0, -1.0],
        ]
    )
    out = sample_cubemap(p, axes)
    np.testing.assert_allclose(out[:, 0], np.arange(1, 7), atol=1e-5)


def test_fail_value():
    p = _params()
    p = p._replace(fail_value=jnp.array([9.0, 8.0, 7.0]))
    out = sample_cubemap(p, jnp.zeros((2, 3)))
    np.testing.assert_allclose(out, np.array([[9.0, 8.0, 7.0]] * 2), atol=1e-6)


def test_seam_continuity():
    """Seamless filtering: crossing a cube edge is continuous."""
    p = _params(L=16, seed=1)
    eps = 1e-3
    # crossing the +x/+z edge (x == z plane)
    d1 = jnp.array([[1.0, 0.3, 1.0 - eps]])
    d2 = jnp.array([[1.0, 0.3, 1.0 + eps]])
    o1 = sample_cubemap(p, d1 / jnp.linalg.norm(d1))
    o2 = sample_cubemap(p, d2 / jnp.linalg.norm(d2))
    assert np.abs(np.asarray(o1 - o2)).max() < 0.02
    # corner region continuity
    d1 = jnp.array([[1.0, 1.0 - eps, 1.0 - 2 * eps]])
    d2 = jnp.array([[1.0, 1.0 - 2 * eps, 1.0 - eps]])
    o1 = sample_cubemap(p, d1 / jnp.linalg.norm(d1))
    o2 = sample_cubemap(p, d2 / jnp.linalg.norm(d2))
    assert np.abs(np.asarray(o1 - o2)).max() < 0.05


def test_gradients():
    p = _params(L=8, seed=2)
    rng = np.random.default_rng(3)
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)

    def loss(tex, fail, d):
        out = sample_cubemap(CubemapParams(tex, fail), d)
        return jnp.sum(out**2)

    gt, gf, gd = jax.grad(loss, argnums=(0, 1, 2))(p.texture, p.fail_value, dirs)
    assert np.abs(np.asarray(gt)).max() > 0  # texel grads
    assert np.abs(np.asarray(gd)).max() > 0  # direction grads
    np.testing.assert_allclose(gf, 0.0)  # no zero dirs -> no fail grad
    assert not np.any(np.isnan(np.asarray(gd)))

    # zero dir routes grad to fail value (nonzero fail, else d(sum(out^2))=0)
    gz = jax.grad(loss, argnums=1)(
        p.texture, jnp.array([0.3, 0.2, 0.1]), jnp.zeros((4, 3))
    )
    assert np.abs(np.asarray(gz)).max() > 0


def test_direction_gradient_finite_difference():
    p = _params(L=16, seed=4)
    # NB: avoid directions mapping to exact half-texel coordinates — bilinear
    # has derivative kinks at texel boundaries where FD and autodiff
    # legitimately disagree (e.g. [0.4,0.55,0.8] lands on sv=13.5 at L=16).
    d = jnp.array([0.413, 0.5437, 0.7821])
    d = d / jnp.linalg.norm(d)

    def f(d):
        return jnp.sum(sample_cubemap(p, d[None])[0])

    g = np.asarray(jax.grad(f)(d))
    for i in range(3):
        e = np.zeros(3)
        e[i] = 1e-4
        fd = (float(f(d + e)) - float(f(d - e))) / 2e-4
        assert abs(fd - g[i]) < 5e-2 * max(1.0, abs(fd)), (i, fd, g[i])


def test_resize_and_sharpen():
    p = _params(L=8, seed=5)
    p2 = resize_cubemap(p, 16)
    assert p2.texture.shape == (6, 3, 16, 16)
    const = CubemapParams(jnp.full((6, 3, 8, 8), 0.2), jnp.zeros(3))
    c2 = resize_cubemap(const, 16)
    np.testing.assert_allclose(c2.texture, 0.2, atol=1e-5)
    p3 = sharpen_cubemap(p2)
    assert p3.texture.shape == p2.texture.shape
    assert not np.any(np.isnan(np.asarray(p3.texture)))


def test_kernel_vs_sort_texel_gradients(monkeypatch):
    """The MXU tap-accumulation kernel and the sort+segment fallback must
    produce identical texture/direction gradients, including seamless edge
    and corner (vertex) pixels."""
    import tpu_splat.kernels.cubemap_accum as ca

    p = _params(L=16, seed=7)
    rng = np.random.default_rng(8)
    dirs = rng.normal(size=(300, 3)).astype(np.float32)
    # force plenty of edge/corner coverage
    corners = np.array(
        [[1, 1, 1], [1, -1, 1], [-1, 1, -1], [1, 1, -1], [-1, -1, -1]],
        np.float32,
    )
    edges = np.array([[1, 1, 0.01], [0.02, 1, -1], [1, 0.0, 1]], np.float32)
    dirs = np.concatenate([dirs, corners + 1e-3, edges])
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)

    def loss(tex, d):
        out = sample_cubemap(CubemapParams(tex, p.fail_value), d)
        return jnp.sum(out**2 + 0.3 * out)

    assert ca.supported_resolution(16, 3)
    gt_k, gd_k = jax.grad(loss, argnums=(0, 1))(p.texture, dirs)

    monkeypatch.setattr(ca, "supported_resolution", lambda L, C: False)
    gt_s, gd_s = jax.grad(loss, argnums=(0, 1))(p.texture, dirs)

    np.testing.assert_allclose(gt_k, gt_s, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(gd_k, gd_s, atol=1e-5, rtol=1e-5)
    assert np.abs(np.asarray(gt_k)).max() > 0


def test_kernel_nonmultiple_lanes(monkeypatch):
    """L*C not a multiple of 128 (L=8 -> 24 lanes) exercises lane padding."""
    import tpu_splat.kernels.cubemap_accum as ca

    p = _params(L=8, seed=9)
    rng = np.random.default_rng(10)
    dirs = rng.normal(size=(97, 3)).astype(np.float32)  # non-multiple of BN
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)

    def loss(tex, d):
        return jnp.sum(sample_cubemap(CubemapParams(tex, p.fail_value), d) ** 2)

    g_k = jax.grad(loss)(p.texture, dirs)
    monkeypatch.setattr(ca, "supported_resolution", lambda L, C: False)
    g_s = jax.grad(loss)(p.texture, dirs)
    np.testing.assert_allclose(g_k, g_s, atol=1e-5, rtol=1e-5)
