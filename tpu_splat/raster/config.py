"""Static rasterizer configuration (shapes & capacities known at trace time).

The reference CUDA runtime sizes its buffers dynamically per frame
(rasterizer_impl.cu:155-194 resizable byte chunks + a num_rendered D2H sync).
On TPU everything under jit must be static, so capacities are explicit here and
callers grow them geometrically when the overflow diagnostics report
truncation (the functional analogue of the reference's resize callback,
rasterize_points.cu:31-37).
"""
from __future__ import annotations

import dataclasses


TILE = 16  # pixels per tile side (reference config.h BLOCK_X/BLOCK_Y)
TILE_PIX = TILE * TILE

# Blending constants (reference auxiliary.h:41-44)
NEAR_N = 0.2
FAR_N = 100.0
FILTER_SIZE = 0.707106  # sqrt(2)/2 low-pass radius
FILTER_INV_SQUARE = 2.0
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4  # transmittance termination
CUTOFF = 3.0  # 3-sigma splat extent


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static capacities; hashable so it can be a jit static arg."""

    max_tiles_per_gaussian: int = 64  # instances emitted per Gaussian (cap)
    max_instances: int = 1 << 20  # global (gaussian, tile) instance capacity
    tile_depth: int = 1024  # per-tile instance capacity (K)
    chunk: int = 32  # instances blended per scan step
    depth_ratio: float = 0.0  # expected(0) vs median(1) surf depth mix
    # "auto" resolves to the Pallas kernels on TPU (the production path,
    # like the reference training on its CUDA rasterizer) and to the XLA
    # scan on CPU (fast enough for tests; Pallas there is interpret-mode).
    backend: str = "auto"  # "auto" | "xla" | "pallas"
    # "train" statically drops the distortion/M1/M2/median cotangent chains
    # from the Pallas backward — provably zero for the reference training
    # loss (train.py:168-196 uses no distortion term; depth_ratio=0 default
    # keeps surf_depth off the median channel). "full" differentiates every
    # forward output (the XLA oracle always does).
    grad_channels: str = "full"  # "full" | "train"
    # bf16-compress the per-instance gradient rows through the backward's
    # sort-regroup (pairs of grad columns bitcast-packed into one i32 sort
    # payload — halves the regroup's dominant sort). Per-instance rounding is
    # ~2^-9 relative BEFORE the f32 per-Gaussian segment sum — standard
    # bf16-gradient-compression territory; training quality is certified by
    # validate_e2e with this flag on. Off by default so parity tests measure
    # exact f32 gradients.
    bf16_grads: bool = False
    # bf16-compress the CONTENT feature rows (color/normal/refl/scope) of
    # the instance slab: pairs pack into one word, shrinking the dominant
    # pack gather [cap, 24]->[cap, 16] and the kernels' per-chunk DMA by a
    # third. Geometry rows (homography/center/log-opacity) stay f32, so
    # alpha/depth/termination are bit-identical; content channels carry
    # bf16 (~2^-9 relative) rounding. Requires bf16_grads (content grads
    # ship bf16-packed through the regroup). Certified with validate_e2e.
    bf16_feats: bool = False
    # per-tile-COLUMN tight culling: instances are emitted per (Gaussian,
    # tile column) with the exact y-extent of the 3-sigma conic (union the
    # low-pass disk) over that column's x-slab, instead of the full
    # per-axis AABB rect — ~25-40% fewer instances on anisotropic clouds.
    # Contributions dropped relative to the rect lie outside the 3-sigma
    # ellipse (alpha < opacity * e^-4.5 ~ 0.011): the same deviation class
    # as the per-axis AABB vs the reference's circular getRect (PARITY.md
    # row 2.1). Requires the Pallas binning path (EXPAND_MODE "kernel",
    # max_instances % 4096 == 0); ignored otherwise.
    tight_culling: bool = False
    # level-1 capacity (tile columns) for tight culling; 0 = max_instances
    # (always sufficient: every column emits >= 1 instance)
    max_columns: int = 0
    # per-tile pad budget for the 128-aligned instance layout: the aligned
    # arrays are statically sized max_instances + n_tiles * pad_per_tile.
    # 128 is the worst case (always exact); per-tile pad counts are
    # (-count) mod 128 — mean 64 with a short-tailed sum across thousands
    # of tiles — so 96 keeps a huge margin while shrinking every
    # cap_al-sized stage (backward regroup sort, pack gather, aligned
    # sort) by ~12%. Overflow (astronomically unlikely below 128) is
    # reported via Binned.pad_overflow; check_growth escalates to 128.
    pad_per_tile: int = 128
    # opacity-aware tile rect: scale each Gaussian's emission rect by
    # sqrt(min(CUTOFF^2, 2*ln(255*opacity)))/CUTOFF and cull opacity < 1/255
    # outright. OUTPUT-EXACT: every dropped (gaussian, tile) overlap could
    # only contribute alpha < 1/255, which the blend kernels' accept mask
    # already skips (kernels/tile_blend.py:477, reference forward.cu:408) —
    # this just stops emitting instances for them. Strictly fewer instances
    # than the reference's opacity-independent 3-sigma rect (forward.cu:222);
    # reported radii stay full 3-sigma for densify-stat parity.
    opacity_rect: bool = False
    # reference-exact circular tile rect (auxiliary.h:71-81 getRect): use
    # max(extent_x, extent_y) on BOTH axes instead of the per-axis AABB.
    # Emits the exact instance set the reference CUDA scheduler emits —
    # used by the reference-oracle parity tests (tests/
    # test_reference_oracle.py); the per-axis box stays the production
    # default (strictly fewer instances, PARITY.md D1).
    circular_rect: bool = False
    # flat-expansion formulation (bin_gaussians): "gather" =
    # mark+cumsum+cummax+[cap,2] row gather; "scan" = hold-last associative
    # scans (gather-free); "kernel" = the Pallas run-decode
    # (kernels/run_expand.py; requires max_instances % 4096 == 0, falls
    # back to "gather" otherwise). All are exact; "gather" measures fastest
    # at bench scale on v5e. Part of the static config (hashable) so the
    # jit cache key carries it — formerly a mutable module global.
    expand_mode: str = "gather"

    def __post_init__(self):
        assert self.tile_depth % self.chunk == 0
        assert self.backend in ("auto", "xla", "pallas"), self.backend
        assert self.grad_channels in ("full", "train"), self.grad_channels
        assert self.expand_mode in ("gather", "scan", "kernel"), self.expand_mode
        assert 1 <= self.pad_per_tile <= 128, self.pad_per_tile
        if self.grad_channels == "train":
            # median-depth cotangents are dropped; surf_depth must not mix
            # the median channel in
            assert self.depth_ratio == 0.0, (
                "grad_channels='train' requires depth_ratio == 0"
            )
        if self.bf16_feats:
            assert self.bf16_grads, "bf16_feats requires bf16_grads"


    def use_pallas(self) -> bool:
        if self.backend == "auto":
            import jax

            return jax.default_backend() == "tpu"
        return self.backend == "pallas"

    @property
    def n_chunks(self) -> int:
        return self.tile_depth // self.chunk


def production_config(**overrides) -> RasterConfig:
    """THE shipped training configuration — one config story.

    scripts/train.py (CLI defaults), bench.py, and validate_e2e.py all
    build their RasterConfig through this helper, so the benchmark number,
    the quality certification, and the shipped trainer describe the same
    switch set (round-3 verdict asked for byte-for-byte agreement):

    - grad_channels="train": statically drop distortion/median cotangent
      chains the reference training loss never reads
    - bf16_grads / bf16_feats: bf16-packed gradient regroup + content rows
      (quality-certified by VALID_r04; A/B vs exact f32 within 0.01 dB)
    - tight_culling=False: the per-column conic decode costs more than it
      saves at 1080p on v5e (see PERF.md); the feature stays available and
      tested (PARITY.md D2) behind --tight_culling
    - pad_per_tile=96: budgeted aligned-pad capacity (overflow-monitored)
    - expand_mode="gather": fastest measured flat expansion on v5e

    Capacity knobs (max_instances, tile_depth, ...) are workload-sized by
    the caller via **overrides.
    """
    base = dict(
        backend="auto",  # pallas on TPU, XLA scan on CPU
        grad_channels="train",
        bf16_grads=True,
        bf16_feats=True,
        tight_culling=False,
        # opacity_rect is accept-mask-exact; measured on v5e at the bench
        # view it cuts 4.2% of the TRAINED-load instance stream (−0.0% on
        # the synthetic cloud, whose opacities mostly sit above the
        # e^4.5/255 saturation threshold — PERF.md). ON since round 5:
        # VALID_r05 certifies the full schedule with it (instance-slot
        # shifts only perturb FP reduction order at the T<1e-4 knife edge,
        # same deviation class as PARITY.md D1/D2).
        opacity_rect=True,
        expand_mode="gather",
        pad_per_tile=96,
    )
    base.update(overrides)
    return RasterConfig(**base)


def production_switches(cfg: RasterConfig) -> dict:
    """The config block every artifact (BENCH_r*, VALID_r*) embeds — the
    switch set that must agree across bench, validation, and the shipped
    CLI (capacity knobs are workload-sized and excluded on purpose)."""
    return {
        "backend": cfg.backend,
        "grad_channels": cfg.grad_channels,
        "bf16_grads": cfg.bf16_grads,
        "bf16_feats": cfg.bf16_feats,
        "tight_culling": cfg.tight_culling,
        "opacity_rect": cfg.opacity_rect,
        "expand_mode": cfg.expand_mode,
        "pad_per_tile": cfg.pad_per_tile,
    }


def tile_grid(height: int, width: int) -> tuple[int, int]:
    return (height + TILE - 1) // TILE, (width + TILE - 1) // TILE
