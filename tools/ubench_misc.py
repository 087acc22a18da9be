"""Micro-bench: expansion alternatives + used-chunk fraction at bench load."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from tools.profile import timed


def main():
    import tpu_splat
    tpu_splat.setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    cap = 3_981_312
    P = 1 << 20
    rng = np.random.default_rng(0)

    # --- window-gather expansion: [n_win, 128] consecutive-row gather of the
    # rect table + per-slot lane select via take_along_axis
    n_win = cap // 128
    tab = jnp.asarray(rng.integers(0, 1 << 30, (P + 256, 2), dtype=np.int32))
    r0_sub = jnp.asarray(
        np.minimum(np.sort(rng.integers(0, P, n_win)), P - 1).astype(np.int32)
    )
    # per-slot rank (ascending, covering runs)
    gsel = jnp.asarray(np.sort(rng.integers(0, P, cap)).astype(np.int32))

    def window_gather(tab, r0_sub, gsel):
        lanes = jnp.arange(128, dtype=jnp.int32)
        cand = tab[r0_sub[:, None] + lanes[None, :]]  # [n_win, 128, 2]
        rel = gsel.reshape(n_win, 128) - r0_sub[:, None]  # [n_win, 128]
        rel = jnp.clip(rel, 0, 127)
        out = jnp.take_along_axis(cand, rel[..., None], axis=1)
        return out

    jax.jit(window_gather)(tab, r0_sub, gsel)
    timed(window_gather, (tab, r0_sub, gsel), name="window-gather expand [cap,2]")

    def plain_gather(tab, gsel):
        return tab[gsel]

    timed(plain_gather, (tab, gsel), name="plain row gather [cap,2]")

    def plain_gather16(tab16, gsel):
        return tab16[gsel]

    tab16 = jnp.asarray(rng.normal(size=(P, 16)).astype(np.float32))
    timed(plain_gather16, (tab16, gsel), name="plain row gather [cap,16]")

    def window_gather16(tab16, r0_sub, gsel):
        lanes = jnp.arange(128, dtype=jnp.int32)
        cand = tab16[r0_sub[:, None] + lanes[None, :]]  # [n_win, 128, 16]
        rel = jnp.clip(gsel.reshape(n_win, 128) - r0_sub[:, None], 0, 127)
        return jnp.take_along_axis(cand, rel[..., None], axis=1)

    tab16b = jnp.asarray(rng.normal(size=(P + 256, 16)).astype(np.float32))
    jax.jit(window_gather16)(tab16b, r0_sub, gsel)
    timed(window_gather16, (tab16b, r0_sub, gsel), name="window-gather [cap,16]")

    # --- monotone unique scatter of 2 columns cap -> cap_al
    cap_al = cap + 8160 * 96
    dst = jnp.asarray(
        np.sort(rng.choice(cap_al, cap, replace=False)).astype(np.int32)
    )
    a = jnp.asarray(rng.integers(0, 1 << 30, cap, dtype=np.int32))

    def mono_scatter(a, dst):
        out = jnp.zeros((cap_al,), jnp.int32)
        return out.at[dst].set(a, indices_are_sorted=True, unique_indices=True)

    timed(mono_scatter, (a, dst), name="monotone scatter 1col cap->cap_al")


if __name__ == "__main__":
    main()
