"""Runtime render configuration.

The reference renderer configures everything at compile time via a macro block
(reference: renderer/Raytracing.h:11-33) plus a hardcoded scene-name string
(reference: renderer/Renderer.mm:17-21).  This framework lifts every one of those
knobs into a runtime dataclass with identical defaults, so a single build serves
every configuration.

Fields are hashable/static so a ``RenderConfig`` can be passed as a static arg to
``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import enum


class ComparisonMode(enum.IntEnum):
    """Golden-image comparison modes (reference: renderer/Raytracing.h:27-33)."""

    DISABLED = 0
    ABSOLUTE_VALUE = 1   # abs(color - ref)
    REF_TO_COLOR = 2     # max(0, ref - color): visible if output darker than reference
    COLOR_TO_REF = 3     # max(0, color - ref): visible if reference darker than output
    LUMINANCE = 4        # red = output brighter, green = reference brighter


class NoiseMode(enum.IntEnum):
    """Random-number supply for the integrator.

    PRNG: counter-based ``jax.random`` — independent samples per pixel, bounce and
    purpose; bit-reproducible across devices and shardings.  This fixes the
    reference's seeding reproducibility hole (wall-clock-seeded mt19937_64,
    reference: renderer/Renderer.mm:109-129).

    TILED: parity mode reproducing the reference's 64x64 float4 noise buffer and
    its tile-index reuse pattern (reference: renderer/Renderer.mm:102-129,
    renderer/Shaders.metal:91,135-138), including the correlated reuse of one
    float4 for light selection, lobe selection and bounce direction.
    """

    PRNG = 0
    TILED = 1


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    # --- feature flags (defaults = reference macro block, Raytracing.h:11-33) ---
    enable_tone_mapping: bool = False      # ENABLE_TONE_MAPPING
    manual_srgb: bool = False              # MANUAL_SRGB: sRGB-encode BEFORE
    #   the comparison diff (in-shader) instead of after (framebuffer);
    #   consulted by utils/compare.blit_display
    accumulate_image: bool = True          # ACCUMULATE_IMAGE
    distance_epsilon: float = 1e-4         # DISTANCE_EPSILON
    angle_epsilon: float = 0.00003807693583  # ANGLE_EPSILON
    noise_dimensions: int = 64             # NOISE_DIMENSIONS
    animate_noise: bool = True             # ANIMATE_NOISE
    max_frames: int = 0                    # MAX_FRAMES (0 = unlimited)
    max_path_length: int = 8               # MAX_PATH_LENGTH
    # CONTENT_SCALE: the reference renders at drawable * 0.5 (Raytracing.h:25,
    # Renderer.mm:642-643).  The runtime surface takes explicit render sizes,
    # so this records the display->render ratio; the CLI's --content-scale
    # applies the reference's drawable semantics (default 1.0: sizes are the
    # render resolution).
    content_scale: float = 1.0
    comparison_mode: ComparisonMode = ComparisonMode.DISABLED
    comparison_scale: float = 10.0         # COMPARISON_SCALE
    spectrum_samples: int = 3              # SPECTRUM_SAMPLES (Spectrum.h:3)
    # Hero-wavelength spectral sampling (spectrum_samples > 3 only): each
    # path traces hero_wavelengths stratified-rotated wavelength bins instead
    # of all S, and scatter-adds them into the S-bin accumulator with weight
    # S/C — unbiased because the scene's BSDFs are non-dispersive (lobe
    # sampling is wavelength-independent).  0 disables (trace all S bins).
    hero_wavelengths: int = 0

    # --- framework extensions (no reference equivalent) ---
    noise_mode: NoiseMode = NoiseMode.PRNG
    # Uniform generation within PRNG mode: "prng" = i.i.d. counter hash;
    # "r2" = Cranley-Patterson-rotated Rd rank-1 lattice over the FRAME
    # index (ops/rng.py:uniforms_r2) - same cost, bit-deterministic, and
    # the progressive accumulator converges markedly faster on smooth
    # integrands (measured table in docs/ROADMAP.md).
    sampler: str = "prng"
    # Replicate reference estimator quirks bit-for-bit (see models/bsdf.py and
    # render/wavefront.py docstrings).  When False, uses the physically
    # conventional balance-heuristic MIS estimator instead.
    reference_quirks: bool = True
    # Snell-bent smooth-dielectric transmission (extension; the reference
    # transmits straight through with no refraction bend,
    # renderer/KernelHelpers.h:151-166).  Two-sided normals, air outside,
    # automatic TIR.  Not combinable with attach_dispersion (whose per-bin
    # reweighting is exact only for straight-through transmission).
    refract_dielectric: bool = False
    # Samples per pixel per frame (the reference always renders 1 spp/frame).
    samples_per_frame: int = 1
    # Max samples fused into ONE wavefront (PRNG noise only; 0/1 disables).
    # Fused samples share every sort/traversal launch, and the extra lane
    # density shrinks the spatial extent each sorted ray-tile spans — the
    # BVH tile unions the traversal pays for shrink with it (v5e, diffuse
    # wavefront: 9.8 Mrays/s at 2M lanes, 13.3 at 4M, 17.4 at 8M).  Each
    # sample keys its RNG on an absolute virtual pixel id, so the image is
    # invariant to how samples are grouped or sharded.  Memory scales with
    # the fused count: 4 fused samples at 1080p (8.3M lanes) exceed a v5e's
    # 16 GB HBM (compile-time OOM at 17.3G), so the default is 2; raise it
    # for smaller frames.
    fuse_samples: int = 2
    # Sequential row tiles per frame on a single chip (1 = whole frame at
    # once).  Each tile's wavefront is height/row_tiles of the lanes, which
    # bounds peak HBM — e.g. fuse_samples=4 at 1080p (17.3G > v5e's HBM as
    # one wavefront) or 4K frames.  Output identical up to float summation
    # order (absolute-pixel RNG); must divide the render height.
    row_tiles: int = 1
    # Intersection backend: "bvh" (default; LBVH + stackless traversal) or
    # "brute" (O(N*T) Moller-Trumbore, for testing/small scenes).
    intersector: str = "bvh"
    # Use the Pallas tile-coherent traversal kernel when on TPU.
    use_pallas: bool = True
    # Ray-tile width for coherent (camera-ray) traversal; also drives the
    # coherent pixel-block ordering in render/order.py.
    traversal_tile: int = 1536
    # Traversal kernel for nearest-hit queries: "window" (v2: 8/16-node DFS
    # windows tested as (W, TILE) vector blocks — fastest for incoherent
    # wavefronts), "minwalk" (v1: one node per step), or "sweep" (v3: no BVH
    # navigation at all — every tile tests every triangle block in one
    # perfectly regular unrolled march, for SECONDARY bounces only; camera
    # rays keep the window kernel).  "sweep" is a MEASURED NEGATIVE on the
    # bench scene: 580 ms vs the window walk's 196 on the production
    # bounce-1 wavefront (scripts/perf_kernel_probe.py, docs/ROADMAP.md r5
    # probe) — the walk's demand pruning beats total regularity even when a
    # sorted tile demands most of the tree.  Kept as the executable record
    # of that result.  Occlusion queries (t_max-capped shadow rays) always
    # use the v1 occlusion path, which skips payload resolve.
    traversal_kernel: str = "window"
    # In-register window chain depth (advance rounds per window fetch).
    traversal_chain: int = 4
    # MT rows per leaf-march step for the coherent (camera) kernel; one
    # 56-row block per leaf56 measured fastest (65.2 vs 68.2 ms at m8).
    traversal_mtblock: int = 56
    # Secondary-bounce (incoherent wavefront) kernel parameters; A/B'd on
    # v5e (scripts/perf_window_ab.py) — smaller tiles + wider windows win
    # when tile unions are large.
    secondary_tile: int = 768
    secondary_window: int = 8
    secondary_mtblock: int = 16
    secondary_chain: int = 6
    # Dense-sweep kernel parameters (traversal_kernel="sweep"): the sweep
    # has no tile-union penalty (every tile tests every triangle block), so
    # it wants the biggest tile that fits VMEM and fat blocks.
    sweep_tile: int = 6144
    sweep_mtblock: int = 56
    # Ray-tile width for occlusion (shadow) queries: coherent + range-capped
    # walks are short, so bigger tiles amortize per-program cost best
    # (6144: 48 ms vs 3072: 55 at leaf8).
    occlusion_tile: int = 6144
    # Any-hit occlusion kernel: shadow lanes die at their FIRST occluder
    # instead of finishing a nearest-hit walk.  Measured on v5e (2M shadow
    # rays, Water-plastic): 24% FASTER for unbounded env-sample rays (no
    # range cap prunes the walk, so early death is the only cut) but ~8%
    # SLOWER for area-light rays (the range cap already ends clear lanes'
    # walks at the light; clear lanes define the tile union, and the
    # occluder/target latches cost extra).  "auto" = any-hit iff the scene
    # carries an environment light; "on"/"off" force it.  Visibility
    # semantics match the reference's nearest-hit==target check up to
    # Moller-Trumbore roundoff (~1e-6) on the occluder-vs-light distance
    # comparison (ops/pallas_traverse.py:_occlusion_anyhit_kernel).
    occlusion_anyhit: str = "auto"
    # Leaf triangle test: "bw" (Baldwin-Weber planes, ~20% fewer vector ops)
    # or "mt" (classic Moller-Trumbore).  An MXU dot-product formulation of
    # the BW planes measured 1.4-1.7x slower (docs/ROADMAP.md).
    tritest: str = "bw"
    # Fuse the NEE occlusion query into the path wavefront's traversal: each
    # bounce runs ONE 2N-lane window walk (path lane, shadow lane interleaved
    # at half-tile blocks — both rays depart the same hit point, so the tile
    # union is paid once for both) instead of a nearest-hit walk plus a
    # separate occlusion walk.  Shadow lanes seed best_t with their range cap
    # and resolve gather-free from the kernel's latched original-triangle id
    # (nearest-hit-must-be-target semantics, reference:
    # renderer/Shaders.metal:214-231 — the reference's two
    # encodeIntersectionToCommandBuffer calls per bounce, collapsed).
    # MEASURED NEGATIVE on the bench scene: the 2N-lane walk costs 279.5 ms
    # vs 243.1 for the separate pair (scripts/perf_kernel_probe.py) — the
    # range-capped leaf8 occlusion walk is already 4x cheaper than the path
    # walk, so fusing it INTO the expensive nearest-hit machinery loses.
    # Kept (tested, exact) as the executable record of that result.
    # Requires the Pallas window kernel (inert + warned otherwise).
    fuse_shadow_walk: bool = False
    # BVH leaf sizes, A/B'd per query class on v5e (scripts, r3): nearest-hit
    # walks win with fat leaves (fewer demanded leaf blocks per tile union;
    # 48: 217 ms, 56: 211, 63: 214 on the 2M diffuse wavefront); range-capped
    # occlusion walks prune most leaves by t_max and prefer small ones
    # (8: 48 ms, 16: 52 at tile 6144).  None = share the nearest-hit layout
    # (saves the second table's HBM + build).  Must stay <= 63 (leaf count
    # packs in 6 bits).
    leaf_size: int = 56
    occlusion_leaf_size: int | None = 8
    # Big-triangle pre-pass size: MT-test the K largest triangles before the
    # walk to prime best_t (K=0 disables; must be a multiple of 8).
    traversal_prepass: int = 32
    # Bake per-material shading constants (diffuse/emissive spectra, IoR,
    # type, roughness) into the per-triangle resolve rows, so the ONE row
    # gather the nearest-hit payload resolve already pays also delivers the
    # material data — XLA's TPU row gather costs per ROW, flat in width
    # (31 ms/2M rows for 4..24 cols, measured) — and the per-bounce
    # compare/select material chains (ops/tables.select_cols) disappear.
    # Baking is exact: table values are copied verbatim per triangle.
    # Dispersion tables (mat_ior_bins) and texture ids keep their own paths.
    bake_materials: bool = False
    # XLA lowering for the payload-resolve row gather, the biggest single
    # linear-stage item (~31 ms per 2M rows on v5e): "rows" = one (N, C)
    # axis-0 row gather (baseline), "cols" = one (C, N) axis-1 gather from
    # the transposed table, "percol" = C independent 1D takes.  Element-
    # identical; A/B with scripts/perf_gather_probe.py before switching.
    resolve_gather: str = "rows"
    # Cull NEE shadow rays whose precomputed contribution is EXACTLY zero in
    # every spectrum bin — delta-lobe lanes (mirror, smooth dielectric) always
    # are, since their BSDF eval returns 0 (reference:
    # renderer/KernelHelpers.h:56-114 — the reference still traces these,
    # renderer/Shaders.metal:149-176).  Bit-exact by construction: a clear
    # shadow ray adds contrib, an occluded one adds 0, and 0 == 0; gated by a
    # full-frame equality test (tests/test_modes.py).  Default OFF after the
    # round-4 A/B (docs/ROADMAP.md): on Water-plastic the culled lanes
    # (~3.9% of shadow rays, the mirror sphere's) ride tile unions the live
    # lanes demand anyway, so the frame got only 3.4 ms faster — tile-union
    # economics make co-resident zero lanes nearly free.  Turn it on for
    # delta-heavy scenes (the dielectric water surface in CornellBox-Water).
    cull_zero_nee: bool = False
    # Sort the wavefront before each secondary bounce by (alive, direction
    # octant, origin Morton cell): dead rays compact into tiles that exit
    # instantly and live rays regain tile coherence (the BASELINE.json
    # "sort-based ray compaction").  One lax.sort with the whole ray state as
    # payload (~26 ms at 2M rays) buys back seconds of divergent traversal.
    sort_rays: bool = True
    # Live-prefix ladder: after each bounce sort (dead lanes last), run the
    # whole per-bounce body (NEE resolve + traversal + shade) on the shortest
    # static power-of-two prefix that still holds every live lane, picked by
    # lax.switch on the live count.  The mean live fraction on the bench
    # scene is ~35% by bounce 4, so the dense per-lane work (payload gather,
    # shade math, occlusion walk) stops paying full-width cost for dead
    # lanes.  Value = number of halvings compiled (3 -> widths N, N/2, N/4,
    # N/8); 0 disables.  Results are bit-identical: per-lane math is
    # tile-independent and dead lanes are never touched by a bounce.
    live_ladder: int = 3
    # Prefix-width bounce sorts (needs live_ladder > 0): each bounce's sort
    # runs at the rung width the PREVIOUS bounce compacted the live lanes
    # into, instead of full wavefront width — dead suffix lanes can never
    # revive, so sorting them again is pure waste (~12 ms x live bounces of
    # sort network at 2M lanes).  The rung rides the fori_loop carry; the
    # stage runs at the sort's width, which trails the eager ladder's rung
    # by at most one bounce on live-count transitions.  Costs one compiled
    # sort instance per rung (the TPU variadic-sort lowering is the compile
    # hot spot — docs/ROADMAP.md), hence opt-in until the A/B says the
    # runtime win pays for it.
    prefix_sort: bool = False
    # Bounce indices (comma-separated, 1-based loop indices in
    # [1, max_path_length)) whose wavefront sort is SKIPPED.  The sort is the
    # one remaining full-width op per bounce (~28 ms/bounce of keys + packing
    # + network at 2M lanes, r4 ablation: sort machinery = 226 ms/frame); a
    # skipped bounce reuses the previous bounce's lane order and ladder rung
    # — exact up to fma-fusion differences across compiled rung widths
    # (dead lanes never revive, so every live lane still sits inside the
    # last sorted prefix).  The trade is a staler tile order for that
    # bounce's walks, and the r4d A/B says the trade LOSES at depth 8:
    # skip "1" costs +13%, "1,6,7" +51% (docs/ROADMAP.md r4d table) — the
    # sort's value is the NEXT walk's tile order, not the sorted rays'.
    # Kept for depth-2 renders where bounce 1 is the only secondary.
    # Empty = sort every bounce (the default pipeline).
    sort_bounce_skip: str = ""
    # Wavefront-sort lowering.  "variadic" = one lax.sort carrying every
    # state plane as payload (runtime-optimal: the sort network moves the
    # rows in place, ~8-15 ms/2M lanes — but the TPU lowering's COMPILE
    # time is super-linear in operand count: 11 planes ~106 s, 24 ~450 s).
    # "gather" = a 3-operand argsort (key, pixel, iota) followed by one
    # jnp.take per payload plane: bit-identical output (lax.sort is stable,
    # so the iota payload IS the variadic sort's permutation), compiles in
    # seconds, and pays the permutation as gathers instead of sort-network
    # moves.  Use it when compile latency matters (first run, prefix_sort's
    # per-rung instances, S>3 spectra that overflow the operand guard).
    sort_lowering: str = "variadic"
    # Per-kernel VMEM budget (MB) for the whole-table-resident Pallas
    # traversal: past this the scene's BVH tables cannot be placed in VMEM
    # (~16 MB/core, minus ray tiles and double buffering) and the renderer
    # falls back to the pure-JAX walker with a RuntimeWarning instead of
    # failing Mosaic compilation.  ~12 MB = roughly 120-140K triangles.
    vmem_table_budget_mb: float = 12.0
    # Production-scale traversal for scenes past the VMEM table budget:
    # "auto" keeps the whole-table kernels while they fit and switches to
    # the HBM-streaming window kernel (triangle table in HBM/pltpu.ANY,
    # demanded MT blocks DMA'd through double-buffered VMEM scratch) when
    # they don't; "on" forces HBM streaming regardless of size (A/B);
    # "off" restores the round-3 behavior (pure-JAX walker fallback).
    hbm_tables: str = "auto"
    # Guard against 0/0 -> NaN when a sampled pdf underflows to exactly zero.
    pdf_floor: float = 1e-20
    # Progressive frames kept in flight before the host blocks: the analog of
    # the reference's triple buffering (MaxBuffersInFlight = 3,
    # reference: renderer/Renderer.mm:16,593-600).  JAX async dispatch queues
    # up to this many donated frame steps; the host syncs only when the queue
    # is full or an image/HUD read needs the data.
    frames_in_flight: int = 3

    def __post_init__(self):
        # Enum-like string knobs fail loudly on typos: a silently-ignored
        # "On"/"true" would invalidate the A/B measurement it was set for.
        checks = {
            "occlusion_anyhit": ("on", "off", "auto"),
            "tritest": ("bw", "mt"),
            "traversal_kernel": ("window", "minwalk", "sweep"),
            "sampler": ("prng", "r2"),
            "intersector": ("bvh", "brute"),
            "resolve_gather": ("rows", "cols", "percol"),
            "sort_lowering": ("variadic", "gather"),
            "hbm_tables": ("auto", "on", "off"),
        }
        for field, allowed in checks.items():
            v = getattr(self, field)
            if v not in allowed:
                raise ValueError(f"{field}={v!r}: expected one of {allowed}")
        if self.sort_bounce_skip:
            try:
                skip = [int(x) for x in self.sort_bounce_skip.split(",")]
            except ValueError:
                raise ValueError(
                    f"sort_bounce_skip={self.sort_bounce_skip!r}: expected "
                    "comma-separated bounce indices, e.g. '1,6,7'") from None
            bad = [b for b in skip if not 1 <= b < self.max_path_length]
            if bad:
                raise ValueError(
                    f"sort_bounce_skip entries {bad} outside the bounce loop "
                    f"range [1, {self.max_path_length})")
            if self.prefix_sort:
                raise ValueError(
                    "sort_bounce_skip is incompatible with prefix_sort (the "
                    "prefix loop's rung IS its sort width)")
            if not self.sort_rays:
                # The skip set only exists inside the sorted-wavefront loop;
                # without sort_rays an A/B "with --sort-skip" measures nothing.
                raise ValueError(
                    "sort_bounce_skip requires sort_rays=True (there is no "
                    "per-bounce sort to skip otherwise)")
        if self.fuse_shadow_walk and (
            self.intersector != "bvh" or not self.use_pallas
            or not self.sort_rays
        ):
            raise ValueError(
                "fuse_shadow_walk requires the Pallas BVH intersector with "
                "sorted wavefronts (intersector='bvh', use_pallas=True, "
                "sort_rays=True) — the fused 2N-lane walk rides the "
                "deferred-shadow pipeline")

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


PI = 3.1415926  # reference: renderer/Raytracing.h:18 (note: float, not math.pi)
IOR_AIR = 1.00029  # initial ray IoR (reference: renderer/Shaders.metal:99)
