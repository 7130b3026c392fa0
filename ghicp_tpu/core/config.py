"""Typed configuration for the GH-ICP TPU engine.

Collects every constant the reference scatters across the CLI
(``test/ghicp_main.cpp:60-78``), the energy function (``include/ghicp_reg.h:26-41``)
and hardcoded literals (``ghicp_main.cpp:96-97,113``) into one documented
dataclass, per SURVEY.md §5 "Config / flag system".
"""
from __future__ import annotations

import dataclasses
import enum


class FeatureType(enum.Enum):
    """Feature encoding for the hybrid metric (utility.h:51-57)."""

    BSC = "bsc"
    FPFH = "fpfh"
    ROPS = "rops"   # implemented here (features/rops.py) — the reference
                    # only declares the enum ("Not passed yet",
                    # ghicp_main.cpp:130-134)
    NONE = "none"


class CorrespondenceType(enum.Enum):
    """Correspondence solver (utility.h:59-64)."""

    KM = "km"    # globally-optimal bipartite matching (auction solver here)
    NN = "nn"    # nearest neighbor with penalty gate
    NNR = "nnr"  # reciprocal nearest neighbor


@dataclasses.dataclass(frozen=True)
class GHICPConfig:
    """All tunables of the GH-ICP pipeline.

    Defaults mirror the reference's large-scale TLS setup
    (``script/run.sh:10-16``) and its hardcoded energy constants
    (``include/ghicp_reg.h:32-40``).
    """

    # --- pipeline switches (ghicp_main.cpp:64-78) ---
    feature: FeatureType = FeatureType.BSC
    correspondence: CorrespondenceType = CorrespondenceType.KM
    reg_dof: int = 6                      # 4 (leveled TLS) or 6
    estimated_overlap: float = 0.6        # estimated IoU of the pair

    # --- preprocessing (run.sh:10-13, ghicp_main.cpp:96-97) ---
    voxel_size: float = 0.1               # downsampling resolution (m)
    neighborhood_radius: float = 0.5      # PCA / curvature radius (m)
    non_max_radius: float = 1.0           # keypoint NMS radius (m)
    unstable_ratio_threshold: float = 0.65
    min_neighbors: int = 20               # stability gate for keypoints
    neighbor_k: int = 128                 # fixed-K cap for radius neighbors
    pca_cell_cap: int = 64                # per-cell candidate cap in PCA
    pca_max_cells: int = 0                # cell-table slots (0 = capacity)
    nms_k: int = 128                      # fixed-K cap for NMS suppression
                                          # (candidate density within the
                                          # NMS radius is ~10-20 at TLS
                                          # settings; the K cap only
                                          # truncates pathological clusters)
    nms_cell_cap: int = 64                # per-cell candidate cap in NMS
    keypoint_capacity: int = 0            # 0 = auto bucket

    # --- sub-voxel keypoint refinement (TPU-build improvement; not in the
    #     reference, whose keypoints sit on raw samples) ---
    refine_keypoints: bool = True
    refine_radius: float = 0.0            # 0 = auto (3 * voxel_size)
    refine_method: str = "centroid"       # "centroid": curvature-weighted
                                          # mean shift over candidates;
                                          # "corner": least-squares tangent-
                                          # plane intersection over surface
                                          # neighbors (sampling-independent
                                          # crease/vertex localization)
    min_curvature: float = 0.0            # extra keypoint gate (0 = ref.)

    # --- adaptive keypoint target band (keypoint_detect.hpp:79-106) ---
    adaptive_keypoints: bool = False
    keypoints_min: int = 5000
    keypoints_max: int = 50000

    # --- BSC feature (ghicp_main.cpp:113; bfe.hpp:63-117) ---
    bsc_grid_side: int = 7                # 7x7 cells per projection plane
    bsc_seed: int = 20170417              # PRNG seed replacing sample_pattern.txt
    bsc_neighbor_k: int = 128             # fixed-K cap inside sqrt(3)*r ball
    bsc_radius: float = 0.0               # descriptor support radius; 0 =
                                          # non_max_radius (reference tie,
                                          # ghicp_main.cpp:113).  Keep grid
                                          # cells 2r/7 above the keypoint
                                          # localization noise
    bsc_offsets: int = 1                  # localization-aware FD (TPU-build
                                          # upgrade; the reference encodes
                                          # at the raw keypoint only,
                                          # bfe.hpp:603-676): encode each
                                          # SOURCE keypoint at this many
                                          # positions (1=off; 3 = {0, +dx,
                                          # +dy}; up to 7 = +-each axis) and
                                          # take FD = min Hamming over
                                          # offsets x flip variants — a
                                          # small spatial search absorbing
                                          # the detector's localization
                                          # noise between the two clouds'
                                          # samplings (measured: 0.1 m
                                          # origin error costs ~25/441
                                          # bits).  Encoding and FD cost
                                          # scale by this factor
    bsc_offset_delta: float = 0.0         # offset step; 0 = voxel_size / 2

    # --- FPFH feature (fpfh.hpp:36-58) ---
    fpfh_k: int = 20                      # KNN for normals + SPFH
    fpfh_radius: float = 0.0              # 0 = auto (3 * voxel_size)

    # --- RoPS feature (features/rops.py; the reference declares the enum
    # but never implements it — ghicp_main.cpp:130-134 "Not passed yet") ---
    rops_radius: float = 0.0              # support radius; 0 = non_max_radius
    rops_rotations: int = 3               # T rotations per LRF axis
    rops_bins: int = 5                    # L x L distribution matrix side
    rops_neighbor_k: int = 256            # fixed neighbor capacity

    # --- energy function (ghicp_reg.h:26-41) ---
    penalty_initial: float = 2.0
    para1_penalty: float = 1.0
    para2_penalty: float = 1.0
    min_cor: int = 10
    weight_changing_rate: float = 6.0     # W_FD = exp(-iter / rate)
    km_eps: float = 0.01                  # assignment epsilon (auction eps)
    scale_factor: float = 0.005           # ED scale = factor * bbx_magnitude

    # --- iteration / convergence (ghicp_reg.h:80, ghicp_reg.cpp:909-914) ---
    weight_adjustment_ratio: float = 1.1
    weight_adjustment_step: float = 0.1
    converge_translation: float = 0.02    # m
    converge_rotation: float = 0.02       # degrees
    max_iterations: int = 100
    engine_chunk: int = 64                # iterations per device dispatch in
                                          # the host-stepped loop.  Remote
                                          # transports impose per-execution
                                          # deadlines (~20s); each chunk also
                                          # costs a tunnel round-trip + two
                                          # scalar fetches (~40ms), so keep
                                          # chunks as large as the deadline
                                          # allows (64 x ~2.4ms/iter <<
                                          # deadline; measured 319 vs 282
                                          # it/s at chunk 64 vs 32, round 2)

    # --- robust transform estimation (upgrade over the reference's plain
    # SVD over all matched pairs, ghicp_reg.cpp:857-866).  The late-stage
    # penalty gate is wide by design (floor 5.0 in scaled cost units,
    # ghicp_reg.cpp:288 — tens of meters), so the complete global matching
    # includes many geometrically-wrong pairs whose consistent displacement
    # can drag the SVD into a wrong basin on scenes with near-symmetric
    # structure.  Confidence weighting scales each pair's SVD weight by its
    # gate margin (penalty - CD: early iterations this is feature
    # agreement, late it is proximity); Tukey IRLS then re-estimates with
    # biweights on the post-fit residuals, suppressing pairs that disagree
    # with the consensus transform. ---
    confidence_weighting: bool = True
    robust_irls_rounds: int = 2           # extra estimate() passes (0 = ref
                                          # parity: one plain weighted SVD)
    robust_trim_c: float = 2.5            # Tukey cutoff = c * mean residual

    # --- coarse initialization (matching/ransac.py; the TPU-parallel
    # equivalent of the reference's SAC-IA coarse registration,
    # common_reg.cpp:392-423, generalized to any feature) ---
    coarse_init: str = "ransac"           # "ransac" | "none" (none = the
                                          # reference's identity start —
                                          # basin-of-attraction lottery when
                                          # feature matching is noisy)
    ransac_tau: float = 0.0               # inlier radius; 0 = 3*voxel_size
    ransac_hypotheses: int = 1 << 17      # hypothesis sweep width
    ransac_min_inliers: int = 12          # below this consensus the coarse
                                          # pose is ignored (identity init)
    identity_hypotheses: int = 1          # identity-start multi-hypothesis
                                          # (coarse_init="none" only; 1 =
                                          # off): run the engine this many
                                          # times with schedule-shifted
                                          # trajectories (it_shift 0, rate,
                                          # 3*rate — progressively less
                                          # FD-dominated early phases) and
                                          # keep the run with the lowest
                                          # honest final matched RMSE.
                                          # Identity start at TLS scales is
                                          # a basin lottery on descriptor-
                                          # hostile pairs (one seed in five
                                          # lands ~86 deg, NOTES round 4);
                                          # the hypotheses explore distinct
                                          # basins for N x the engine cost.
                                          # The default RANSAC coarse init
                                          # remains the production answer
    ransac_candidates: int = 4            # feature-nearest target candidates
                                          # per source row (dense-FD lane).
                                          # Consensus scoring tests each row
                                          # against ALL its candidates
                                          # (nearest under the hypothesis
                                          # pose): at sparse keypoint counts
                                          # the true counterpart rarely
                                          # ranks first — with top-1-only
                                          # scoring the bench's NMS-1.0
                                          # verdict config collapsed to 7
                                          # inliers on a wrong pose (round-5
                                          # diagnosis); 4 candidates recover
                                          # the basin.  Frame-hypothesis and
                                          # scoring cost scale linearly
    ransac_max_rows: int = 8192           # streaming lane: cap on source
                                          # rows used for candidate
                                          # generation + hypotheses (a
                                          # strided spatial subsample of the
                                          # Morton-ordered keypoints).  The
                                          # consensus vote needs thousands,
                                          # not all 50k, of rows — capping
                                          # saves a full factor-product pass
                                          # at flagship scale

    # --- auction solver (eps-scaling forward auction with outside option) ---
    auction_max_rounds: int = 2           # TOTAL sweep budget per solve
                                          # (traced: may vary per engine
                                          # iteration without recompiles).
                                          # Three mechanisms make a small
                                          # budget lossless for pose:
                                          # assignment+price warm starts
                                          # across engine iterations (only
                                          # eps-CS violators re-bid), in-
                                          # kernel epsilon escalation
                                          # (contested tails resolve at
                                          # geometrically coarser margins
                                          # instead of flat greedy
                                          # completion), and margin-
                                          # weighted robust estimation.
                                          # Measured at 6.6k kps (round 2,
                                          # 5-seed identity-start, single
                                          # phase): budget 2/4/8 all land
                                          # 0.10-0.15 deg worst-seed at
                                          # 195/~160/137 it/s — MORE robust
                                          # than the old 8/2-phase default
                                          # (12.5 deg on one seed: the
                                          # phase-boundary repair reopened
                                          # rows mid-trajectory).  Raise
                                          # toward 2000+ for exact-KM-
                                          # parity studies
    auction_warm_rounds: int = 1          # when > 0, the per-solve sweep
                                          # budget drops to this value once
                                          # it_eff > auction_warm_after (the
                                          # warm-start carries the matching;
                                          # fewer full-matrix GS sweeps per
                                          # iteration).  0 = single budget
                                          # for the whole run
    auction_warm_after: float = 8.0       # it_eff threshold for the warm
                                          # budget
    auction_warm_min_rows: int = 4096     # the warm budget only engages at
                                          # this many total source rows or
                                          # more.  At sparse keypoint counts
                                          # (the reference's NMS 1.0-1.5 m
                                          # TLS parameterization,
                                          # run.sh:13-14) identity-start
                                          # trajectories converge through
                                          # 20-30 pose-forming iterations
                                          # where budget 1 measurably
                                          # degrades the final pose
                                          # (BENCH_r04: 0.12 -> 0.18 deg on
                                          # the verdict pair); the solve is
                                          # cheap there anyway.  The warm
                                          # budget's win lives at dense
                                          # counts where full sweeps
                                          # dominate the iteration
    auction_phases: int = 1               # epsilon-scaling phases in the
                                          # whole-phase kernel path (python-
                                          # unrolled launches).  Each phase
                                          # boundary runs a CS repair that
                                          # reopens rows (re-wars burn the
                                          # rounds budget).  With the
                                          # assignment warm start + in-kernel
                                          # escalation, a single phase at the
                                          # final epsilon is both fastest and
                                          # the most seed-robust (probe19,
                                          # round 2: phases 1 worst-seed 0.15
                                          # deg vs 12.5 deg at phases 2).
                                          # Multi-phase ladders remain for
                                          # cold-start/exact-parity studies
                                          # (with budgets >= 48)
    fused_cost_kernel: bool = True        # fuse ED + CD blend + stats +
                                          # benefit emission into one Pallas
                                          # sweep (ops/cost_kernel.py) on the
                                          # single-device KM path (the gate
                                          # is implied by benefit > -penalty,
                                          # so the per-iteration ed/cd/gate
                                          # HBM tensors never materialize,
                                          # and the auction reuses the
                                          # kernel's spread stat instead of
                                          # another full pass).  Since the
                                          # assignment warm start landed,
                                          # identity-start trajectories at
                                          # production budgets measure 0.000
                                          # deg fused (round 2); flip off to
                                          # reproduce the reference's
                                          # separate-matrix passes
    warm_fused_kernel: bool = True        # single-launch warm iteration
                                          # (dense BSC+KM lane): once the
                                          # engine iteration is stats-free
                                          # (it_eff > 1) AND an assignment
                                          # warm start exists (it >
                                          # auction_warm_after), the whole
                                          # solve — benefit construction
                                          # from FD stripes + coordinate
                                          # factors, exact v1/vsel at the
                                          # bidding prices, the warm-start
                                          # keep test, Gauss-Seidel bidding
                                          # AND greedy completion — runs in
                                          # ONE Pallas launch
                                          # (ops/auction_rounds.py::
                                          # auction_warm_fused_pallas).  Per
                                          # warm iteration the [S,T] benefit
                                          # tensor is neither written nor
                                          # read: HBM traffic is one bf16 FD
                                          # stream for sweep-0 plus the
                                          # open tiles of later sweeps.
                                          # This is the single-kernel fusion
                                          # the round-4 factor_gs experiment
                                          # was the parts bin for — unlike
                                          # that split (hint launch + factor
                                          # GS launch, 286 it/s), sweep-0's
                                          # computed tiles are bid from
                                          # directly, so nothing is computed
                                          # twice.  Cold/stats iterations
                                          # keep the two-kernel path
    streaming_cost: str = "auto"          # matrix-free cost lane: "on" |
                                          # "off" | "auto".  When on, FD and
                                          # the benefit matrix are NEVER
                                          # materialized — each auction sweep
                                          # recomputes benefits from the
                                          # coordinate/feature factors
                                          # (ops/stream_kernel.py), removing
                                          # the reference's n_s x n_t memory
                                          # wall (ghicp_reg.h:26-30).  "auto"
                                          # = on when the keypoint capacity
                                          # exceeds streaming_threshold
                                          # (dense-matrix HBM and sweep
                                          # traffic stop paying for
                                          # themselves).  All three
                                          # correspondence modes: KM via the
                                          # streaming auction; NN/NNR via a
                                          # single sweep per iteration
                                          # (row-wise top-1 + column-side
                                          # min/argmin for the reciprocal
                                          # test).  The ring lane stays
                                          # KM-only
    streaming_threshold: int = 16384      # "auto" cutover capacity: below
                                          # it the fused dense kernels win
                                          # (benefit matrix ~0.5GB bf16 at
                                          # 16k); above, dense FD alone
                                          # exceeds multiple GB and the
                                          # factor sweeps win on memory AND
                                          # bandwidth
    stream_open_cap: int = 2048           # streaming lane: compact the
                                          # still-open rows into a block of
                                          # this capacity before each
                                          # bidding/completion sweep when
                                          # they fit, so warm sweeps cost
                                          # O(cap * T) instead of O(S * T)
                                          # (kept rows never re-bid; their
                                          # tiles were pure waste).  0
                                          # disables; full sweeps whenever
                                          # more rows are open (cold starts).
                                          # On the TPU kernel path the cap is
                                          # rounded UP to the sweep kernel's
                                          # row-tile granularity (256), so
                                          # sub-tile caps still engage
    stream_refresh_every: int = 32        # force a full observation sweep-0
                                          # every N engine iterations on the
                                          # warm fast path (0 = never): the
                                          # carried v1/spread bounds grow by
                                          # the drift terms every stats-free
                                          # solve and are only re-anchored by
                                          # a full sweep — a periodic refresh
                                          # bounds the looseness (and the
                                          # epsilon inflation it feeds) over
                                          # long fast streaks
    final_resolve_rounds: int = 3000      # after convergence, re-solve the
                                          # matching ONCE at the final pose
                                          # with this sweep budget (KM lanes;
                                          # 0 = off): the exported
                                          # correspondences and the
                                          # success-verdict RMSE then honor
                                          # KM's one-to-one semantics
                                          # (km.cpp:144-162) instead of
                                          # carrying the production budget's
                                          # greedy-completion duplicates
                                          # (~750 at the 6.6k bench) and
                                          # stale completions.  Warm-started
                                          # from the final prices +
                                          # assignment, so only the
                                          # contested tail re-bids — one
                                          # extra solve per registration.
                                          # The budget is sized for the
                                          # SINK ENDGAME of near-square
                                          # wide-gate problems (surplus
                                          # rows only sink once prices
                                          # rise ~penalty across their
                                          # reachable columns — measured
                                          # ~1.8k rounds at a 668-row CLI
                                          # scene; epsilon escalation then
                                          # terminates the tail at modest
                                          # coarsening, rmse 1.13 vs the
                                          # 0.71 unconstrained optimum,
                                          # where a 300-round cap left
                                          # escalation garbage at 2.1)
    stream_compact_budget: int = 48       # compact-resolve lanes: total bidding
                                          # rounds allowed while the open
                                          # set fits the compact block
                                          # (extends auction_max_rounds —
                                          # a compact sweep costs
                                          # ~open_cap/S of a full one, so
                                          # the released rows' price wars
                                          # resolve through cheap sweeps
                                          # instead of falling en masse to
                                          # greedy completion, which is
                                          # not one-to-one)
    stream_fast_path: bool = True         # streaming lane: skip sweep-0 in
                                          # stats-free iterations (BSC past
                                          # the CD-stats phase of the
                                          # penalty schedule,
                                          # ghicp_reg.cpp:279-293) by
                                          # carrying per-row v1 upper
                                          # bounds across iterations —
                                          # prices only rise, so stale v1
                                          # plus the drift inflation stays
                                          # a sound keep-test bound.  Warm
                                          # iterations then touch only
                                          # CS-violator rows, never S x T
    auction_rel_eps: float = 1.0 / 64.0   # final-eps floor as a fraction of
                                          # the benefit spread: assignment is
                                          # within n*rel_eps*spread of
                                          # optimal. Collapses price wars on
                                          # tie-heavy (integer Hamming) cost
                                          # matrices; below the inter-
                                          # keypoint ED margin (~NMS radius *
                                          # scale) it does not flip clear
                                          # decisions. 0 = absolute km_eps
                                          # only (exact-parity mode)

    # --- compile-time behavior ---
    parallel_compile_warmup: bool = True  # overlap XLA compilation of
                                          # later pipeline stages with
                                          # earlier ones: as soon as a
                                          # stage's shapes are known,
                                          # background threads invoke the
                                          # downstream jits on dummy data
                                          # of those shapes (compiles
                                          # parallelize ~3x on the remote
                                          # TPU backend, measured round 3;
                                          # once cached the threads are
                                          # no-ops).  Affects cold-start
                                          # wall clock only — results of
                                          # warm calls are discarded

    # --- numerics ---
    use_mxu_hamming: bool = True          # matmul-based Hamming (vs popcount)
    auction_bf16: bool = True             # store the auction benefit matrix
                                          # bf16 (halves the per-round HBM
                                          # sweep; quantization ~2^-8 of
                                          # spread sits below the rel_eps
                                          # floor).  On the fused-kernel path
                                          # this also keeps the FD copy (and
                                          # hence the matched-pair FDM/FDstd
                                          # stats gather feeding the penalty
                                          # schedule) in bf16 — the reference
                                          # computes those stats in double
                                          # (ghicp_reg.cpp:546-567), but the
                                          # ~2^-9 relative rounding of
                                          # integer Hamming distances sits
                                          # far below the schedule's own
                                          # sensitivity. False = f32 exact
                                          # everywhere
    auction_round_kernel: bool = True     # run bidding rounds in the
                                          # whole-phase Pallas kernel
                                          # (ops/auction_rounds.py): state
                                          # lives in VMEM across rounds, one
                                          # launch per epsilon phase —
                                          # measured 1.55x engine speed at
                                          # 6k kps with identical accuracy.
                                          # Dispatches on single-device TPU
                                          # only; elsewhere the XLA round
                                          # loop runs

    def __post_init__(self):
        if self.reg_dof not in (4, 6):
            raise ValueError(f"reg_dof must be 4 or 6, got {self.reg_dof}")
        if self.bsc_grid_side < 3:
            raise ValueError("bsc_grid_side must be >= 3")

    @property
    def bsc_num_variants(self) -> int:
        """LCS variants per source keypoint: 4 for 6-DoF, 2 for 4-DoF
        (bfe.hpp:791-828); target always uses 1."""
        return 4 if self.reg_dof == 6 else 2

    @property
    def bsc_grid_bits(self) -> int:
        """Occupancy bits: 3 planes x side^2 (bfe.hpp:68)."""
        return 3 * self.bsc_grid_side * self.bsc_grid_side

    @property
    def bsc_compare_bits(self) -> int:
        """Comparison bits: per plane, side^2 pairs x {depth, density}
        (bfe.hpp:69-70)."""
        return 6 * self.bsc_grid_side * self.bsc_grid_side

    @property
    def bsc_total_bits(self) -> int:
        return self.bsc_grid_bits + self.bsc_compare_bits
