"""Default configuration tree.

Mirrors the reference defaults schema (reference:
``segmentron/config/settings.py::cfg``) so the reference's YAML files in
``configs/`` load unchanged, while adding a TPU block for mesh / precision
/ pipeline knobs that have no CUDA analogue.
"""

import time

from .config import SegmentronConfig

cfg = SegmentronConfig()

# ---------------------------------------------------------------- global
cfg.SEED = 1024
cfg.TIME_STAMP = time.strftime("%Y-%m-%d-%H-%M", time.localtime())
cfg.ROOT_PATH = ""
cfg.PHASE = "train"  # train | test | visual

# ---------------------------------------------------------------- dataset
cfg.DATASET = SegmentronConfig()
cfg.DATASET.NAME = ""
cfg.DATASET.MEAN = [0.485, 0.456, 0.406]
cfg.DATASET.STD = [0.229, 0.224, 0.225]
cfg.DATASET.IGNORE_INDEX = -1
cfg.DATASET.WORKERS = 4
# decoded-image disk cache dir ("" = off): post-decode uint8 arrays are
# .npy-cached and memory-mapped on later epochs, replacing the per-epoch
# PNG/JPEG decode with page-cache reads (data/cache.py; env
# SEGMENTRON_DECODED_CACHE overrides)
cfg.DATASET.DECODED_CACHE = ""
cfg.DATASET.MODE = "testval"  # val-time transform mode: val | testval
cfg.DATASET.DEVICE_CANVAS = ()  # (H, W) static source canvas for the
#   on-device train augment (data/device_input.py): must cover every
#   source image. Empty = use the dataset class's DEVICE_CANVAS
#   (cityscapes: 1024x2048); datasets with neither fall back to the
#   host augment.

# ---------------------------------------------------------------- train
cfg.TRAIN = SegmentronConfig()
cfg.TRAIN.EPOCHS = 30
cfg.TRAIN.BATCH_SIZE = 1
cfg.TRAIN.CROP_SIZE = 769
cfg.TRAIN.BASE_SIZE = 1024
cfg.TRAIN.MODEL_SAVE_DIR = "runs/checkpoints/"
cfg.TRAIN.LOG_SAVE_DIR = "runs/logs/"
cfg.TRAIN.PRETRAINED_MODEL_PATH = ""
cfg.TRAIN.BACKBONE_PRETRAINED = True
cfg.TRAIN.BACKBONE_PRETRAINED_PATH = ""
cfg.TRAIN.RESUME_MODEL_PATH = ""
cfg.TRAIN.SYNC_BATCH_NORM = True
cfg.TRAIN.SNAPSHOT_EPOCH = 1
# reference: TRAIN.APEX (CUDA fp16). On TPU the analogue is bf16 compute —
# kept as a distinct knob; APEX is accepted-but-ignored for YAML compat.
cfg.TRAIN.APEX = False

# ---------------------------------------------------------------- solver
cfg.SOLVER = SegmentronConfig()
cfg.SOLVER.LR = 1e-4
cfg.SOLVER.OPTIMIZER = "sgd"  # sgd | adam | adamw
cfg.SOLVER.EPSILON = 1e-8
cfg.SOLVER.MOMENTUM = 0.9
cfg.SOLVER.WEIGHT_DECAY = 1e-4
cfg.SOLVER.DECODER_LR_FACTOR = 10.0
cfg.SOLVER.LR_SCHEDULER = "poly"  # poly | cosine | step
cfg.SOLVER.POLY = SegmentronConfig()
cfg.SOLVER.POLY.POWER = 0.9
cfg.SOLVER.STEP = SegmentronConfig()
cfg.SOLVER.STEP.GAMMA = 0.1
cfg.SOLVER.STEP.DECAY_EPOCH = [10, 20]
cfg.SOLVER.WARMUP = SegmentronConfig()
cfg.SOLVER.WARMUP.EPOCHS = 0.0
cfg.SOLVER.WARMUP.FACTOR = 1.0 / 3
cfg.SOLVER.WARMUP.METHOD = "linear"  # linear | constant
cfg.SOLVER.OHEM = False
cfg.SOLVER.OHEM_THRESH = 0.7
cfg.SOLVER.OHEM_MIN_KEPT = 100000
cfg.SOLVER.AUX = False
cfg.SOLVER.AUX_WEIGHT = 0.4
cfg.SOLVER.LOSS_NAME = ""  # '' -> CE; focal | lovasz | dice | binary_dice

# ---------------------------------------------------------------- test
cfg.TEST = SegmentronConfig()
cfg.TEST.TEST_MODEL_PATH = ""
cfg.TEST.USE_BEST = False  # restore the durable best-mIoU checkpoint
#   (<TEST_MODEL_PATH>_best, rotation-immune) instead of the latest
#   rotating snapshot — the reference's best_model.pth semantics
cfg.TEST.BATCH_SIZE = 1
cfg.TEST.CROP_SIZE = None  # sliding-window window size; None = whole image
cfg.TEST.SCALES = [1.0]  # multi-scale TTA factors
cfg.TEST.FLIP = False  # horizontal-flip TTA
cfg.TEST.DISTRIBUTED = True  # data-parallel TTA eval over the mesh when
#   more than one device is visible (psum'd confusion matrix; results
#   are bit-identical to single-device — integer CM sum)
cfg.TEST.BUCKET_QUANT = 0  # shape-bucketed testval eval (engine/
#   bucketed.py): >0 pads each native-size image up to the next
#   multiple-of-QUANT bucket (mask padded with ignore) and compiles ONE
#   program per bucket — variable-size val sets (ADE20K/VOC: hundreds
#   of distinct sizes at ~5 min/remote compile) become evaluable.
#   0 = off (fixed-size datasets like Cityscapes compile one program
#   anyway). Window grids / resize matrices / flip geometry enter the
#   compiled program as data, so results on the real pixels match the
#   unbucketed path (bit-exact at scale 1.0; f32-rounding-exact across
#   scales). See the module docstring for the small-image deviation.
cfg.TEST.SPATIAL_SHARD = False  # GSPMD-shard image HEIGHT across the
#   mesh for whole-image forwards (parallel/spatial.py) — the sequence-
#   parallel analogue for full-res attention heads whose activations
#   exceed one chip's HBM (SURVEY §5.7)

# ---------------------------------------------------------------- visual
cfg.VISUAL = SegmentronConfig()
cfg.VISUAL.OUTPUT_DIR = "runs/visual/"

# ---------------------------------------------------------------- model
cfg.MODEL = SegmentronConfig()
cfg.MODEL.MODEL_NAME = ""
cfg.MODEL.BACKBONE = ""
cfg.MODEL.BACKBONE_SCALE = 1.0
cfg.MODEL.MULTI_LOSS_WEIGHT = [1.0]
cfg.MODEL.DEFAULT_GROUP_NUMBER = 32
cfg.MODEL.DEFAULT_EPSILON = 1e-5
cfg.MODEL.BN_TYPE = "BN"  # BN | SyncBN | FrozenBN | GN
cfg.MODEL.BN_EPS_FOR_ENCODER = None
cfg.MODEL.BN_EPS_FOR_DECODER = None
cfg.MODEL.OUTPUT_STRIDE = 16
cfg.MODEL.BN_MOMENTUM = None  # torch-convention momentum (1 - decay)

# per-model sub-trees -----------------------------------------------------
cfg.MODEL.DANET = SegmentronConfig()
cfg.MODEL.DANET.MULTI_DILATION = None
cfg.MODEL.DANET.MULTI_GRID = False

cfg.MODEL.DEEPLABV3_PLUS = SegmentronConfig()
cfg.MODEL.DEEPLABV3_PLUS.USE_ASPP = True
cfg.MODEL.DEEPLABV3_PLUS.ENABLE_DECODER = True
cfg.MODEL.DEEPLABV3_PLUS.ASPP_WITH_SEP_CONV = True
cfg.MODEL.DEEPLABV3_PLUS.DECODER_USE_SEP_CONV = True

cfg.MODEL.OCNet = SegmentronConfig()
cfg.MODEL.OCNet.OC_ARCH = "base"  # base | pyramid | asp

cfg.MODEL.ENCNET = SegmentronConfig()
cfg.MODEL.ENCNET.SE_LOSS = True
cfg.MODEL.ENCNET.SE_WEIGHT = 0.2
cfg.MODEL.ENCNET.LATERAL = True

cfg.MODEL.CCNET = SegmentronConfig()
cfg.MODEL.CCNET.RECURRENCE = 2

cfg.MODEL.CGNET = SegmentronConfig()
cfg.MODEL.CGNET.STAGE2_BLOCK_NUM = 3
cfg.MODEL.CGNET.STAGE3_BLOCK_NUM = 21

cfg.MODEL.POINTREND = SegmentronConfig()
cfg.MODEL.POINTREND.BASEMODEL = "DeepLabV3_Plus"
cfg.MODEL.POINTREND.NUM_POINTS = 1024  # train-time sampled points
cfg.MODEL.POINTREND.OVERSAMPLE = 3  # candidate multiplier k
cfg.MODEL.POINTREND.IMPORTANCE = 0.75  # beta: fraction picked by uncertainty
cfg.MODEL.POINTREND.SUBDIVISION_STEPS = 2
cfg.MODEL.POINTREND.SUBDIVISION_POINTS = 2048

cfg.MODEL.XCEPTION = SegmentronConfig()
cfg.MODEL.XCEPTION.MIDDLE_BLOCKS = 16  # 16 = Xception-65; small values
#   give width-true slim variants for CI / multichip dryruns (the CPU
#   compile of the full 16-block fwd+bwd takes >10 min)

cfg.MODEL.HRNET = SegmentronConfig()
cfg.MODEL.HRNET.PRETRAINED_LAYERS = ["*"]
cfg.MODEL.HRNET.STEM_INPLANES = 64
cfg.MODEL.HRNET.FINAL_CONV_KERNEL = 1
cfg.MODEL.HRNET.WITH_HEAD = True
# OCR head (HRNet-W48 + OCR benchmark config)
cfg.MODEL.HRNET.OCR = SegmentronConfig()
cfg.MODEL.HRNET.OCR.ENABLE = False
cfg.MODEL.HRNET.OCR.MID_CHANNELS = 512
cfg.MODEL.HRNET.OCR.KEY_CHANNELS = 256

# ---------------------------------------------------------------- tpu (new)
# No analogue in the reference: mesh/precision/pipeline knobs for TPU.
cfg.TPU = SegmentronConfig()
cfg.TPU.MESH_SHAPE = []  # [] -> 1-D data mesh over all devices
cfg.TPU.MESH_AXES = ["data"]
cfg.TPU.COMPUTE_DTYPE = "float32"  # float32 | bfloat16
cfg.TPU.PREFETCH = 2  # host->device pipeline depth
cfg.TPU.REMAT = "none"  # activation remat: none | dots | full
cfg.TPU.DEVICE_AUGMENT = True  # run the train random scale/crop/flip/
#   blur/normalize ON DEVICE (ops/preprocess.py): the loader ships raw
#   uint8 source canvases and the host keeps only the decode + RNG
#   draws. Identical augmentation stream (same per-sample draws);
#   pixels match the fused native host augment to f32 summation order,
#   masks bit-exactly (PIL-extracted nearest indices). Auto-falls back
#   to the host path for datasets without a known DEVICE_CANVAS.
#   Rationale: the r4 host feed measured 12.7 img/s warm vs the 63.9
#   img/s step demand (VERDICT r4 #1).
cfg.TPU.DEVICE_NORMALIZE = True  # testval/serving: ship raw uint8 and
#   fold (x/255 - mean)/std into the jitted graph (identical to <=1-2
#   ulp; removes the measured 24 MB/img host normalize pass and 4x
#   relay traffic).
cfg.TPU.USE_PALLAS = True  # blockwise Pallas attention (enables DANet/
#   OCNet at resolutions where the (HW)^2 affinity cannot materialize)
cfg.TPU.USE_PALLAS_SEPCONV = False  # fused sepconv kernels measured
#   SLOWER than XLA's conv emitters model-level on v5e (v1 manual-DMA:
#   29 img/s; v2 pipelined-BlockSpec: 34 img/s; XLA path: 50 img/s on
#   the bench config) — XLA's conv fusion already keeps this workload
#   at the HBM roofline and the per-layer halo materialization costs
#   more than the intermediate it saves. Kept as reference kernels +
#   parity tests. See BASELINE.md.
cfg.TPU.DONATE = True  # donate train-state buffers into the step
cfg.TPU.INT8_ACTIVATIONS = False  # static-int8 backbone inference
#   (ops/quant.py): False/"none" = off; "pw" = int8 pointwise convs
#   only (bf16 depthwise, int8 dw->pw hop — the fastest measured
#   variant); True/"full" = every backbone conv + activation int8
#   (measured SLOWER than bf16 end-to-end on v5e: the int8 depthwise
#   lowering loses more than the pointwise gains). Scales derive from
#   BN statistics — no calibration pass. Eval-only; accuracy/perf
#   deltas documented in BASELINE.md.
cfg.TPU.INT8_K = 6.0  # BN-sigma multiple bounding the activation range
cfg.TPU.INT8_RESNET = False  # int8 INTERIOR hops in ResNet bottlenecks
#   (quantize fused into conv1's epilogue; conv2 3x3 + conv3 1x1 run
#   s8 x s8 on the MXU; the residual/skip chain stays bf16 so quant
#   noise never accumulates across blocks; auto-reverts to bf16 at
#   dilation >= 8 where the dilated int8 lowering regresses). Chip-A/B'd
#   in r4: OCNet 26.05 -> 28.97 img/s, DANet 23.43 -> 26.15 @1024x2048
#   (BASELINE.md "Round-4 full-res attention component map"); default
#   off globally, enabled by the serve_cityscapes_*_int8.yaml configs.
cfg.TPU.INT8_CALIBRATE = False  # INTERNAL: set by engine/calibrate.py
#   during the measured-amax calibration forward (f32 path + per-site
#   |max| observation into the 'quant_amax' collection). Not a user knob.
cfg.TPU.INT8_CALIBRATION_BATCHES = 0  # >0: before an int8 eval, run
#   this many val batches through the f32 model recording per-site
#   per-channel |max| activations, and quantize with those measured
#   ranges instead of the 6-sigma BN heuristic (the fallback VERDICT r2
#   asked for if the heuristic costs mIoU). 0 = heuristic only.
cfg.TPU.INT8_CALIBRATION_HEADROOM = 1.25  # multiplier on the measured
#   ranges: N calibration batches under-sample the eval set's tails, so
#   the raw max CLIPS outliers the 6-sigma heuristic covers (measured:
#   raw-max calibration 0.0969 mIoU vs heuristic 0.1010, BASELINE.md
#   int8 accuracy table). >1 trades a little resolution for headroom;
#   1.0 = raw measured max.
cfg.TPU.FUSED_SEPCONV_V3 = False  # in INT8_ACTIVATIONS="pw" mode, run
#   large stride-1 sepconvs through the fused v3 Pallas kernel
#   (ops/sepconv.py): halo rows fetched as overlapping BlockSpec
#   streams (nothing materialized XLA-side, unlike v2), dw->pw requant
#   in-register, s8 x s8 MXU pointwise. Measured FASTER than the XLA
#   pw path on every gated entry-flow shape standalone (up to 1.6x per
#   layer) and pallas->pallas chaining is free, BUT each XLA-conv ->
#   pallas boundary costs ~1.3 ms in relayout copies at entry-flow
#   sizes (measured, BASELINE.md) — so scattering single fused layers
#   between XLA convs is a model-level REGRESSION (35 vs 55 img/s).
#   Off until the entry flow runs as one unbroken pallas chain.
cfg.TPU.FUSED_ENTRY_V3 = ""  # comma-separated XceptionBlock names
#   (e.g. "block2") allowed to run the conv-skip v3 pallas chain in
#   pw mode. Entry blocks measured net-slower in r2 (46.8 vs 54.1
#   img/s) BEHIND AN XLA STEM; with FUSED_STEM="block1" the candidate
#   block consumes a default-layout pallas output, so the
#   pallas->pallas hop is free and fusing block2 moves the one
#   pallas->XLA relayout from the 33 MB block1 output to the 16.8 MB
#   block2 output. Experimental knob; default decided by model-level
#   A/B (BASELINE.md round 3).
cfg.TPU.FUSED_SEPCONV_MIN_BYTES = 80 * 1024 * 1024  # v3 gate: in+out
#   bf16 traffic below this measured faster on the XLA path
cfg.TPU.DW_SHIFT = True  # dilated depthwise convs (rate >= 12) as 9
#   shifted-slice MACs (ops/dwconv.py): XLA's dilated-dw lowering
#   degrades with rate (d=6 0.49 / d=12 0.81 / d=18 1.18 ms at ASPP
#   geometry) while the shift form stays flat (~0.67). Exact.
cfg.TPU.DW_BWD_SHIFT = False  # hybrid depthwise for 3x3 stride-1:
#   keep the XLA conv FORWARD (fastest at small dilation — the
#   all-shift train variant measured 125 -> 253 ms/step) but compute
#   the BACKWARD as shift MACs (dx = flipped-kernel correlation, dk =
#   9 shifted multiply-reduces) via a custom VJP
#   (ops/dwconv.py::depthwise3x3_shiftbwd). Default from the train
#   A/B in BASELINE.md round 3.
cfg.TPU.SCOPED_VMEM_KIB = 0  # per-compile xla_tpu_scoped_vmem_limit_kib
#   override (0 = backend default, 16 MB on v5e). FUSED_STEM="block1"
#   implies 24576 when left at 0 — the fused entry kernel's stack is
#   ~19.6 MB (utils/compileopts.py).
cfg.TPU.FUSED_STEM = "block1"  # Xception entry chain as ONE pallas
#   kernel (ops/entrychain.py). False = off; "stem" = conv1+conv2 only
#   (standalone win 1.42 vs 1.84 ms but model-level REGRESSION 55.9 vs
#   72.5 img/s — the pallas->XLA boundary at stride 2 costs more than
#   the fusion saves); "block1" = stem + whole block1 (3 sepconvs +
#   skip) to stride 4: standalone 2.39 vs 6.72 ms AND model-level
#   72.65 -> 84.01 img/s on v5e @1024x2048 (BASELINE.md round 3) —
#   the default. Eval-only; gated to supported geometry/backends in
#   backbones/xception.py::_fused_stem_mode.
cfg.TPU.ELIDE_COLLECTIVES = True  # skip psum/pmean over size-1 mesh
#   axes at trace time (SyncBN -> BN downgrade + step-level grad/loss/
#   stats/CM reduction skip). A single-replica collective is the
#   identity but XLA emits it anyway (~4 ms/step measured on the v5e
#   train config). Numerically equivalent per apply (<=1e-6, pinned by
#   tests/test_single_replica_skip.py; NOT bit-exact — SyncBN's
#   E[x^2]-E[x]^2 variance differs in ulps from plain BN's). False
#   forces the multi-replica graph on one chip — only useful for A/B
#   measurement of the elision itself.
cfg.TPU.STEM_WBLOCK = True  # W-blocked stem conv (ops/stem.py): exact
#   reformulation of the C_in<=4 image conv that feeds the MXU B*C
#   contraction lanes via FREE NHWC reshapes. 3.0x on the Xception
#   conv1 @1024x2048 (2.62 -> 0.88 ms standalone); applies to every
#   backbone stem. Exact => safe for train + eval.

# ---------------------------------------------------------------- utils
cfg.UTILS = SegmentronConfig()
cfg.UTILS.EPOCH_STOP = -1  # early stop for smoke runs; -1 disables
cfg.UTILS.DEBUG_NANS = False  # jax_debug_nans: fail fast on NaN (SURVEY §5.2)
cfg.UTILS.PROFILE_STEPS = 0  # trace this many train steps with jax.profiler
cfg.UTILS.PROFILE_START = 10  # first step to trace (skip compile+warmup)
cfg.UTILS.PROFILE_DIR = "runs/profile"
