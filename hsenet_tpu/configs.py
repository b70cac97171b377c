"""Typed configuration for every hsenet-tpu component.

The reference spreads configuration over per-entry-point HF dataclasses
(`/root/reference/Preprint/LaMed/src/train/train_VLM.py:59-174`) and
`PretrainedConfig` subclasses (`model/CLIP_stage1.py:14-54`). Here the whole
framework shares one typed config module; everything is a frozen dataclass so
configs can be closed over by jitted functions and hashed as static args.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


def _tuple3(x) -> Tuple[int, int, int]:
    t = tuple(int(v) for v in x)
    assert len(t) == 3
    return t  # type: ignore[return-value]


# ---------------------------------------------------------------------------
# Vision encoders
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ViT3DConfig:
    """3D ViT encoder (reference `ViT_stage1`, vit.py:360-469).

    Defaults mirror the reference production setting: (32,256,256) volumes,
    (4,16,16) patches -> 2048 tokens, hidden 768, 12 layers x 12 heads
    (`train_CLIP_stage1.py:58-70`).
    """

    in_channels: int = 1
    image_size: Tuple[int, int, int] = (32, 256, 256)
    patch_size: Tuple[int, int, int] = (4, 16, 16)
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    dropout_rate: float = 0.0
    qkv_bias: bool = False  # MONAI SABlock default (vit.py:90 qkv_bias=False)
    classification: bool = True  # adds a CLS token (vit.py:455-460)
    # 2E3 (stage-2) extras — reference `ViT_stage2` (vit.py:222-357)
    slice_guided: bool = False  # slice-guided cross-attn + patch scoring
    # the reference hardcodes Dropout(0.1) inside the slice-guided
    # cross-attention (vit.py:247); configurable here so equality tests
    # (e.g. sp-vs-dense) can pin it at 0
    slice_dropout_rate: float = 0.1
    num_slices: int = 32  # rows of the (32, 768) BiomedCLIP feature matrix
    slice_feature_dim: int = 768
    # int8 W8A8 serving mode: block matmuls run int8 x int8 on the MXU (~2x
    # bf16 FLOPs); per-output-channel weight scales + dynamic per-token
    # activation scales. Convert params with
    # models.lora.quantize_kernels_int8(..., VIT_QUANT_TARGETS). Inference
    # only — training and checkpoint-parity evals stay bf16.
    quant_w8a8: bool = False
    # Static (calibrated) activation scales for the W8A8 mode: replaces the
    # per-token absmax VPU reduction with a per-layer scalar calibrated by
    # models.lora.calibrate_w8a8_act_scales (isolated MLP block: 1.38 ->
    # 1.24 ms, BENCH.md). Requires quant_w8a8=True and a calibration pass;
    # out-of-range activations clip at +-127.
    quant_w8a8_static: bool = False
    # Flash-attention q-block override. None = kernel default (1152, safe
    # inside large fused programs). The serving encode at batch <= 8 fits
    # the whole 2176-token sequence in one block (+3% measured, BENCH.md);
    # larger batches/programs exceed the 16 MB scoped-VMEM budget and fail
    # to compile — opt-in only.
    attn_block_q: Optional[int] = None
    # NOTE: attention deliberately stays bf16 inside the W8A8 mode. int8
    # attention was built and measured in round 3 (scripts/_probe_pallas_
    # int8.py, BENCH.md): the Q.K^T contraction is head_dim=64 where the v5e
    # MXU runs int8 ~4x SLOWER than bf16, and quantising P costs ~3 VPU ops
    # over the whole (S,S) matrix — the end-to-end int8 kernel measured
    # 0.68x the bf16 kernel. Rejected on measurement, not on principle.
    # tanh-approximate GELU in the block MLPs: the exact-erf GELU costs as
    # much VPU time as the MLP matmuls themselves (BENCH.md: 1.79 vs 0.91
    # ms per block at production shapes); tanh matches erf only to ~5e-4
    # absolute (19% of bf16 values differ by >1 ulp), so this is an opt-in
    # speed/numerics trade — the reference's MONAI blocks use exact erf.
    gelu_approx: bool = False

    @property
    def grid(self) -> Tuple[int, int, int]:
        return tuple(i // p for i, p in zip(self.image_size, self.patch_size))  # type: ignore[return-value]

    @property
    def num_patches(self) -> int:
        d, h, w = self.grid
        return d * h * w

    @property
    def seq_len(self) -> int:
        return self.num_patches + (1 if self.classification else 0)

    @property
    def patch_dim(self) -> int:
        p0, p1, p2 = self.patch_size
        return p0 * p1 * p2 * self.in_channels


@dataclass(frozen=True)
class SwinConfig:
    """Hierarchical 3D Swin encoder (reference `image_encoder_swin.py`:
    SwinTransformer — windowed MHSA with relative position bias, shifted
    windows every other block, PatchMerging between stages).

    The reference vendors this as an alternative SAM image encoder but never
    registers it (`sam_model_registry` only exposes 'vit', build_sam.py:46-48);
    here it is a first-class SegVol encoder option. Defaults produce a
    SegVol-compatible (4,16,16)x768 feature grid from (32,256,256) volumes:
    patch (2,4,4) -> (16,64,64)@192, two merges -> (4,16,16)@768.
    """

    in_channels: int = 1
    image_size: Tuple[int, int, int] = (32, 256, 256)
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 192
    window_size: Tuple[int, int, int] = (4, 4, 4)
    depths: Tuple[int, ...] = (2, 2, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True  # reference SwinTransformer default
    dropout_rate: float = 0.0
    patch_norm: bool = False
    gelu_approx: bool = False  # opt-in tanh GELU (see ViT3DConfig note)

    @property
    def grid(self) -> Tuple[int, int, int]:
        """Final-stage feature grid (each merge halves every axis)."""
        scale = 2 ** (len(self.depths) - 1)
        return tuple(
            i // p // scale for i, p in zip(self.image_size, self.patch_size)
        )  # type: ignore[return-value]

    @property
    def out_dim(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)


@dataclass(frozen=True)
class ViT2DConfig:
    """2D ViT trunk (BiomedCLIP ViT-B/16-compatible) for online slice features.

    The reference runs a frozen open_clip BiomedCLIP trunk offline
    (`Data/data_processing/CT-RATE/CT-RATE_2D_to_npy_file.py:88`); we support
    running it in-graph as well (reference vit.py:529-532).
    """

    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    in_channels: int = 3

    @property
    def num_patches(self) -> int:
        g = self.image_size // self.patch_size
        return g * g


# ---------------------------------------------------------------------------
# Text encoder (BERT-base, reference CLIP_stage1.py:78)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0


# ---------------------------------------------------------------------------
# CLIP pretraining (stage 1 + stage 2)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CLIPConfig:
    """Dual-encoder CLIP (reference `M3DCLIP_stage1/2`, CLIP_stage1.py:57-159).

    `scale_is_log` replicates a reference quirk: the learnable logit_scale is
    initialised to log(1/0.07) and *multiplied in raw form* (never
    exponentiated) — CLIP_stage1.py:90,144-152. Set False for that behavior
    (the default, for checkpoint parity); True applies exp() like OpenAI CLIP.
    """

    vision: ViT3DConfig = field(default_factory=ViT3DConfig)
    text: BertConfig = field(default_factory=BertConfig)
    projection_dim: int = 768
    logit_scale_init: float = 2.6592600369327783  # log(1/0.07)
    scale_is_log: bool = False
    max_text_len: int = 128
    gather_loss: bool = True  # global (all-device) contrastive batch
    # stage-2 semantic-consistency regulation (CLIP_stage2.py:141-151)
    relation_max_weighted_step: int = 5000
    relation_base_weight: float = 0.1


# ---------------------------------------------------------------------------
# Spatial packer projectors (reference spatial_pooling_projector.py)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PackerConfig:
    """`VisualPacker_3d_phi_v3` (spatial_pooling_projector.py:121-153).

    2048 HR tokens viewed as an (8,16,16) grid; kernel (1,4,4) windows ->
    128 output tokens, each a pooled query cross-attending its 16-token
    window, then a Linear-GELU-Linear MLP into LLM space.
    """

    grid: Tuple[int, int, int] = (8, 16, 16)
    kernel: Tuple[int, int, int] = (1, 4, 4)
    in_dim: int = 768
    out_dim: int = 3072
    dropout_rate: float = 0.1
    # {packer_v3, spatial_pooling, mlp, qformer, med2e3}
    projector_type: str = "packer_v3"
    pooling_size: int = 2  # for spatial_pooling baseline
    mlp_depth: int = 2
    num_queries: int = 32  # for the qformer ablation head

    @property
    def out_grid(self) -> Tuple[int, int, int]:
        return tuple(g // k for g, k in zip(self.grid, self.kernel))  # type: ignore[return-value]

    @property
    def proj_out_num(self) -> int:
        if self.projector_type == "qformer":
            return self.num_queries
        if self.projector_type == "mlp":
            a, b, c = self.grid
            return a * b * c  # per-token head: no pooling
        a, b, c = self.out_grid
        return a * b * c

    @property
    def window_size(self) -> int:
        a, b, c = self.kernel
        return a * b * c


# ---------------------------------------------------------------------------
# LLM (Phi-3/Phi-4-mini family; reference lamed_phi3.py + HF Phi3)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LoRAConfig:
    """LoRA on all LLM linear layers (reference train_VLM.py:254-264,424-441)."""

    rank: int = 16
    alpha: int = 32
    dropout_rate: float = 0.05
    # which projection names receive LoRA (all linears, like the reference)
    targets: Tuple[str, ...] = (
        "q_proj", "k_proj", "v_proj", "o_proj",
        "gate_proj", "up_proj", "down_proj",
    )

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


@dataclass(frozen=True)
class Phi3Config:
    """Phi-3/Phi-4-mini decoder config (HF `Phi3Config`-compatible subset).

    Defaults are Phi-4-mini-instruct (~3.8B): hidden 3072, 32 layers, 24 q
    heads / 8 kv heads (GQA), head_dim 128, fused qkv and gate_up projections,
    partial rotary factor 0.75. The reference loads this via HF 8-bit
    (`train_VLM.py:376-380`); on TPU we run bf16.
    """

    vocab_size: int = 200064
    hidden_size: int = 3072
    intermediate_size: int = 8192
    num_layers: int = 32
    num_heads: int = 24
    num_kv_heads: int = 8
    head_dim: int = 128
    max_position_embeddings: int = 131072
    original_max_position_embeddings: int = 4096
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 0.75
    # LongRoPE (Phi-3/4 rope_scaling type "longrope"): per-frequency divisors
    # for short (seq <= original_max) and long contexts, with the paper's
    # sqrt(1 + ln(factor)/ln(original_max)) attention scaling on cos/sin.
    rope_short_factor: Optional[Tuple[float, ...]] = None
    rope_long_factor: Optional[Tuple[float, ...]] = None
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = True
    attention_bias: bool = False
    lora: Optional[LoRAConfig] = None
    # int8 weight-only projections (the reference serves 8-bit via
    # bitsandbytes); convert params with models.lora.quantize_kernels_int8.
    # Also the QLoRA-style FINETUNE base (train_vlm --int8-base, the
    # reference's load_in_4bit analog): the frozen int8 base composes with
    # `lora`, and the train step differentiates through the dequant to the
    # trainable leaves only (allow_int grads, train/vlm.py).
    quant_int8: bool = False
    # int8 weight-only embedding/LM-head table (per-vocab-row scales). The
    # tied 200k x 3072 bf16 table is 1.23 GB of HBM read per decoded token —
    # a quarter of all decode traffic; int8 halves it. Convert params with
    # models.lora.quantize_embed_int8.
    quant_int8_embed: bool = False
    # NOTE: no int4 analog of the reference's load_in_4bit
    # (train_VLM.py:372) on purpose — probed and rejected in round 3
    # (scripts/_probe_int4_stream.py, BENCH.md): XLA stores S4 buffers
    # byte-per-element (no traffic win) and every packed-nibble unpacking
    # scheme is 2.5-7x SLOWER than streaming int8; int8 weight-only is the
    # fastest storable decode format on v5e, already at its ~600 GB/s
    # speed of light (161 tok/s b1).
    # remat policy when the model is built with remat=True:
    #   "full" (default) — save only block inputs, recompute everything in
    #   the backward (smallest memory; the reference's grad-checkpointing
    #   analog, train_VLM.py gradient_checkpointing).
    #   "dots" — jax.checkpoint_policies.dots_with_no_batch_dims_saveable:
    #   keep matmul outputs, recompute only elementwise glue (more HBM,
    #   fewer recompute FLOPs; fits the 4B LoRA finetune at batch 2/16 GB).
    remat_policy: str = "full"

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)


@dataclass(frozen=True)
class LlamaConfig:
    """Llama-3-style decoder (reference `LamedLlamaForCausalLM`, lamed_llama.py)."""

    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 500000.0
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False
    lora: Optional[LoRAConfig] = None
    # int8 serving (the analog of the reference loading llama 4-bit,
    # lamed_llama.py): maps straight onto the shared Phi3 decoder's
    # quantized modules — see llama_as_phi3_config.
    quant_int8: bool = False
    quant_int8_embed: bool = False


# ---------------------------------------------------------------------------
# Multimodal VLM assembly (reference lamed_arch.py + train_VLM.py)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VLMConfig:
    """HSENet VLM: dual vision tower + dual packers + Phi LLM.

    `tower_mode` mirrors `remain_2d3d_ViT_type` (vit.py:944-948):
    dual_vits | 3d_vit | 2e3_vit. With dual_vits + parallel projectors the
    LLM sees 128+128=256 `<im_patch>` tokens (train_VLM.py:446-453).
    """

    vision: ViT3DConfig = field(
        default_factory=lambda: ViT3DConfig(classification=True)
    )
    packer: PackerConfig = field(default_factory=PackerConfig)
    llm: Phi3Config = field(default_factory=Phi3Config)
    tower_mode: str = "dual_vits"
    use_parallel_projector: bool = True
    select_feature: str = "patch"  # strip CLS before packing (vit.py:934-938)
    # token ids configured at assembly time from the tokenizer
    im_patch_token_id: int = -1
    seg_token_id: int = -1
    # optional SegVol branch (reference ships it disabled, train_VLM.py:99)
    seg_enable: bool = False
    seg_vision: Optional[ViT3DConfig] = None  # defaults to `vision` w/o CLS
    # in-graph BiomedCLIP slice features (reference ViT4LLM_v3 online mode);
    # when True, image_2d inputs are optional — features come from a frozen
    # 2D trunk over resized volume slices
    online_slice_features: bool = False
    vit2d: Optional[ViT2DConfig] = None
    # stop gradients at the tower outputs (reference freeze_vision_tower
    # default True, train_VLM.py): beyond the optimizer mask, this lets XLA
    # skip the entire dual-tower backward — the mask alone computes those
    # grads and then zeroes them
    stop_tower_gradients: bool = True

    @property
    def num_image_tokens(self) -> int:
        n = self.packer.proj_out_num
        if self.tower_mode == "dual_vits":
            return 2 * n
        if self.tower_mode == "med2e3":
            # [pooled 3D tokens | score-weighted slice tokens]
            return n + self.vision.num_slices
        return n


# ---------------------------------------------------------------------------
# Data / preprocessing
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PreprocessConfig:
    """Fused on-device CT preprocessing.

    Semantics from the reference offline scripts
    (`CT-RATE_nii_to_3D_volume_npy_file.py:41-124`): HU = slope*raw+intercept,
    clamp to [hu_min, hu_max], resample to (1.5, 0.75, 0.75) mm spacing,
    min-max normalize, crop foreground (>0), resize to (32,256,256).
    The 2D-slice path (`CT-RATE_nii_to_2D_slices.py:183-221`) clamps to
    [-1000, 1000] and divides by 1000 before slice extraction.
    """

    target_shape: Tuple[int, int, int] = (32, 256, 256)
    target_spacing: Tuple[float, float, float] = (1.5, 0.75, 0.75)
    hu_min: float = -1000.0
    hu_max: float = 200.0
    slice_hu_min: float = -1000.0
    slice_hu_max: float = 1000.0
    num_slices: int = 32
    slice_size: int = 224


@dataclass(frozen=True)
class AugmentConfig:
    """Train-time augmentation (reference multi_dataset.py:45-56)."""

    rot90_prob: float = 0.5
    flip_prob: float = 0.10
    scale_intensity_prob: float = 0.5
    scale_intensity_factor: float = 0.1
    shift_intensity_prob: float = 0.5
    shift_intensity_offset: float = 0.1


# ---------------------------------------------------------------------------
# Parallelism / training
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MeshConfig:
    """SPMD mesh layout. dp: data parallel; tp: tensor parallel (LLM);
    pp: pipeline parallel (decoder layer stages, parallel/pipeline.py);
    sp: sequence parallel (vision-tower token ring, parallel/sp.py);
    fsdp: optional param sharding along dp for ZeRO-style memory savings.
    pp > 1 builds a ("dp", "pp") mesh and requires tp == 1 (tp-inside-pp
    is future work; see parallel/pipeline.py); sp > 1 likewise builds a
    ("dp", "sp") mesh and requires tp == pp == 1."""

    dp: int = -1  # -1 = all remaining devices
    tp: int = 1
    pp: int = 1
    sp: int = 1
    axis_names: Tuple[str, str] = ("dp", "tp")


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03  # reference script/train_clip_stage1.sh
    schedule: str = "cosine"
    total_steps: int = 10000
    batch_size: int = 24  # global (reference: 3/GPU x 8)
    max_grad_norm: float = 1.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    dtype: str = "bfloat16"  # compute dtype; params stay f32
    remat: bool = False
    seed: int = 42
    log_every: int = 50
    eval_every: int = 500
    checkpoint_every: int = 1000
    zero1: bool = False  # shard optimizer state along dp
    # host->device double-buffering: keep N batches already placed on
    # device ahead of the step loop (data/prefetch.py); 0 = inline copies
    device_prefetch: int = 2
    # jax.profiler device trace over steps [profile_start, profile_stop)
    # written to profile_dir (TensorBoard/Perfetto-viewable); "" = off.
    # Default window skips step 1's compile so the trace shows steady state.
    profile_dir: str = ""
    profile_start: int = 2
    profile_stop: int = 4


def replace(cfg, **kw):
    """Convenience dataclasses.replace passthrough."""
    return dataclasses.replace(cfg, **kw)
