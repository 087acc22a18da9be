"""tpu_splat — TPU-native differentiable Gaussian splatting with deferred reflections.

A from-scratch JAX/Pallas/pjit framework with the capabilities of the reference
CUDA/torch codebase (gssales/gaussian-splatting-reflection): 2DGS surfel
rasterization with reflection strengths, a learned cubemap environment map with
deferred reflection shading, adaptive density control, and the full
train/render/eval toolchain — redesigned for TPU:

- No atomics, no dynamic allocation: static-capacity instance buffers, stable
  64-bit-equivalent lexicographic sort (`jax.lax.sort`), and deterministic
  segment reductions replace the CUDA tile runtime
  (reference: submodules/diff-surfel-rasterization/cuda_rasterizer/rasterizer_impl.cu).
- Alpha compositing is formulated as chunked prefix ops over a
  [tiles, K] instance matrix, fully vectorized on the VPU, differentiable
  end-to-end (reference: forward.cu renderCUDA / backward.cu).
- Multi-chip: tile-grid sharding via shard_map over a jax.sharding.Mesh with
  psum'd parameter gradients (the reference is strictly single-GPU).
"""

__version__ = "0.1.0"


def setup_compilation_cache(path: str | None = None) -> str | None:
    """Opt-in persistent XLA compilation cache (full-scale 1M-Gaussian/1080p
    pipelines take minutes to compile). Called by the CLI entry points; a
    plain `import tpu_splat` has no side effects. Returns the cache dir used,
    or None if the environment already configures one / setup failed."""
    import os

    if "JAX_COMPILATION_CACHE_DIR" in os.environ:
        return None
    cache = path or os.path.expanduser("~/.cache/jax_compcache")
    try:
        os.makedirs(cache, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache
    except (OSError, AttributeError) as e:  # pragma: no cover - env specific
        import warnings

        warnings.warn(f"compilation cache setup failed: {e}")
        return None
