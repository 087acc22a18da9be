"""Micro-bench: env cubemap sampling forward/backward variants at 1080p.

Uses a smooth synthetic reflection-direction map (what deferred reflection
feeds the sampler in real scenes: dirs vary smoothly except along object
silhouettes), plus a random-dir worst case. Forward = XLA gathers; backward
= the one-hot MXU tap-accumulation kernel.
"""
from __future__ import annotations

import numpy as np

from profile_stages import timed


def main():
    import jax
    import jax.numpy as jnp

    from tpu_splat.envmap import cubemap as cm
    from tpu_splat.envmap.cubemap import CubemapParams, init_cubemap, sample_cubemap

    H, W, L, C = 1088, 1920, 128, 3
    params = init_cubemap(jax.random.PRNGKey(0), channels=C, resolution=L)

    # smooth dirs: reflect a fixed view ray off a low-frequency normal field
    yy, xx = np.meshgrid(
        np.linspace(-1, 1, H), np.linspace(-1, 1, W), indexing="ij"
    )
    n = np.stack(
        [
            np.sin(2.1 * xx + 0.3) * 0.6,
            np.cos(1.7 * yy - 0.2) * 0.6,
            np.ones_like(xx),
        ],
        axis=-1,
    )
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    v = np.array([0.0, 0.0, -1.0])
    dirs_smooth = (v - 2 * (n @ v)[..., None] * n).astype(np.float32)
    rng = np.random.default_rng(0)
    dirs_rand = rng.normal(size=(H, W, 3)).astype(np.float32)
    dirs_rand /= np.linalg.norm(dirs_rand, axis=-1, keepdims=True)

    for name, dirs_np in [("smooth", dirs_smooth), ("random", dirs_rand)]:
        dirs = jnp.asarray(dirs_np)

        # edge-pixel fraction and flagged-block fraction in tile order
        face, u, vv = cm._face_uv(dirs)
        su = (u * 0.5 + 0.5) * L
        sv = (-vv * 0.5 + 0.5) * L
        edge = (su < 0.5) | (su >= L - 0.5) | (sv < 0.5) | (sv >= L - 0.5)
        flat = cm._tileorder(edge.shape)
        e = np.asarray(flat(edge))
        nb = e.size // 512
        frac_blocks = float(np.max(e[: nb * 512].reshape(nb, 512), axis=1).mean())
        print(f"[{name}] edge px {float(edge.mean()):.4f}  flagged blocks {frac_blocks:.4f}")

        def fwd(tex, dirs):
            p = CubemapParams(texture=tex, fail_value=params.fail_value)
            return jnp.sum(sample_cubemap(p, dirs))

        def fwdbwd(tex, dirs):
            return jax.grad(fwd, argnums=(0, 1))(tex, dirs)

        timed(fwd, (params.texture, dirs), name=f"[{name}] env fwd gather")
        timed(fwdbwd, (params.texture, dirs), name=f"[{name}] env fwd+bwd")


if __name__ == "__main__":
    main()
