"""Model/architecture configurations for the TPU-native CoVer-VLA stack.

Hyperparameters mirror the reference capabilities (see SURVEY.md):
  - PaliGemma-3B language model + SigLIP so400m vision tower
    (reference: lerobot_custom/.../pi0/paligemma_with_expert.py:81-150)
  - Gemma 300M action expert (same file, :126-150)
  - pi0 flow-matching policy config
    (reference: lerobot_custom/.../pi0/configuration_pi0.py:25-153)
  - SigLIP2 ViT-L/16-384 verifier backbone + trainable heads
    (reference: bridge_verifier/ensemble_eval/model.py,
     finetune_trajectory_bridge_ddp.py:182-421)

All configs are frozen dataclasses so they can be closed over by jitted
functions as static values.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple


# ---------------------------------------------------------------------------
# Transformer backbones
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GemmaConfig:
    """Gemma-family decoder config (RMSNorm + GQA + GeGLU)."""

    width: int
    depth: int
    mlp_dim: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    vocab_size: int = 0  # 0 => no token embedding table (e.g. action expert)
    rope_theta: float = 10_000.0
    rms_eps: float = 1e-6

    @property
    def qkv_dim(self) -> int:
        return self.num_heads * self.head_dim


@dataclass(frozen=True)
class VitConfig:
    """SigLIP-style ViT encoder config (pre-LN, learned pos-emb, no CLS)."""

    width: int
    depth: int
    mlp_dim: int
    num_heads: int
    patch_size: int
    image_size: int
    ln_eps: float = 1e-6
    # tanh-approx GELU (HF gelu_pytorch_tanh) vs exact erf GELU
    # (timm/open_clip nn.GELU — the SigLIP2 verifier towers)
    gelu_approx: bool = True
    # tower MHA backend: "xla" (eager, fp32-parity posture) | "pallas"
    # (flash kernel). Config-plumbed so engines with different backends can
    # coexist in one process (no module-global mutation).
    attn_impl: str = "xla"
    # allow reduced-precision MXU passes in the score matmul
    fast_math: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.width // self.num_heads


@dataclass(frozen=True)
class SiglipTextConfig:
    """SigLIP2 text tower (bidirectional transformer, last-token pool)."""

    width: int
    depth: int
    mlp_dim: int
    num_heads: int
    vocab_size: int
    context_length: int
    embed_dim: int  # output dim of text_projection
    ln_eps: float = 1e-6
    gelu_approx: bool = False  # open_clip TextTransformer uses exact GELU
    attn_impl: str = "xla"     # see VitConfig.attn_impl
    fast_math: bool = False


# Reference hyperparameters --------------------------------------------------

# PaliGemma-3B language model (paligemma_with_expert.py:87-103)
PALIGEMMA_LM = GemmaConfig(
    width=2048, depth=18, mlp_dim=16384, num_heads=8, num_kv_heads=1,
    head_dim=256, vocab_size=257_152,
)

# Gemma 300M action expert (paligemma_with_expert.py:126-150)
GEMMA_EXPERT = GemmaConfig(
    width=1024, depth=18, mlp_dim=4096, num_heads=8, num_kv_heads=1,
    head_dim=256, vocab_size=0,
)

# SigLIP so400m/14 vision tower at 224 (paligemma_with_expert.py:104-116)
SIGLIP_SO400M = VitConfig(
    width=1152, depth=27, mlp_dim=4304, num_heads=16, patch_size=14,
    image_size=224,
)

# SigLIP2 ViT-L/16 vision tower at 384 (open_clip hf-hub:timm/ViT-L-16-SigLIP2-384,
# finetune_trajectory_bridge_ddp.py:1414)
SIGLIP2_L16_384_VISION = VitConfig(
    width=1024, depth=24, mlp_dim=4096, num_heads=16, patch_size=16,
    image_size=384, gelu_approx=False,  # timm ViT: exact nn.GELU
)

# SigLIP2 ViT-L text tower (open_clip text_cfg: width 1024 / 24 layers,
# gemma vocab 256000, context 64, Linear text_projection to embed_dim 1024)
SIGLIP2_L16_384_TEXT = SiglipTextConfig(
    width=1024, depth=24, mlp_dim=4096, num_heads=16, vocab_size=256_000,
    context_length=64, embed_dim=1024,
)


# ---------------------------------------------------------------------------
# pi0 policy
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Pi0Config:
    """pi0 flow-matching policy (reference configuration_pi0.py:25-153).

    CoVer uses chunk_size=4 / n_action_steps=4 and tokenizer_max_length=72
    (INT-ACT/config/model/pi0_finetune_bridge.json); upstream pi0 defaults
    are 50/50/48.
    """

    paligemma: GemmaConfig = PALIGEMMA_LM
    expert: GemmaConfig = GEMMA_EXPERT
    vision: VitConfig = SIGLIP_SO400M

    chunk_size: int = 4
    n_action_steps: int = 4
    max_state_dim: int = 32
    max_action_dim: int = 32
    proj_width: int = 1024
    num_denoise_steps: int = 10
    tokenizer_max_length: int = 72
    num_images: int = 1
    # sinusoidal time embedding periods (modeling_pi0.py:611)
    time_min_period: float = 4e-3
    time_max_period: float = 4.0
    # prefill/decode attention backend: "xla" (fp32-upcast eager parity) or
    # "pallas" (bf16-input flash kernels; mirrors the reference's
    # attention_implementation flag, paligemma_with_expert.py:72). Applies
    # to both the prefill GQA and the shared-prefix decode kernel.
    attention_impl: str = "xla"
    # decode (shared-prefix expert) backend; "" = inherit attention_impl.
    # Separate because the measured optimum mixes them (prefill xla,
    # decode/towers pallas at the bench shapes).
    decode_attn_impl: str = ""
    # allow reduced-precision MXU passes in attention-score matmuls
    # (measured +11% end-to-end verified-step throughput, identical
    # selected actions, ~5e-5 score deviation)
    fast_math: bool = False
    # dtype of the reference's hard embedding casts (modeling_pi0.py:534,579:
    # img/state embeddings are rounded through bf16 before mixing with the
    # fp32 projection outputs). "float32" disables the rounding — used for
    # the fp32 full-path parity oracle.
    compute_dtype: str = "bfloat16"

    @property
    def prefix_len(self) -> int:
        return self.num_images * self.vision.num_patches + self.tokenizer_max_length

    @property
    def suffix_len(self) -> int:
        return 1 + self.chunk_size  # state token + action tokens


def tiny_pi0_config(chunk_size: int = 4, tokenizer_max_length: int = 8) -> Pi0Config:
    """A miniature pi0 for unit tests / CPU mesh dry-runs."""
    return Pi0Config(
        paligemma=GemmaConfig(width=64, depth=2, mlp_dim=128, num_heads=4,
                              num_kv_heads=1, head_dim=16, vocab_size=1024),
        expert=GemmaConfig(width=32, depth=2, mlp_dim=64, num_heads=4,
                           num_kv_heads=1, head_dim=16, vocab_size=0),
        vision=VitConfig(width=32, depth=2, mlp_dim=64, num_heads=4,
                         patch_size=14, image_size=56),
        chunk_size=chunk_size,
        n_action_steps=chunk_size,
        max_state_dim=32,
        max_action_dim=32,
        proj_width=32,
        num_denoise_steps=3,
        tokenizer_max_length=tokenizer_max_length,
    )


# ---------------------------------------------------------------------------
# Verifier
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VerifierConfig:
    """SigLIP2 contrastive trajectory verifier.

    Mirrors ModelConfig (bridge_verifier/ensemble_eval/model.py:115-135) and
    VLA_SigLIP2_Bridge (finetune_trajectory_bridge_ddp.py:182-262).
    """

    vision: VitConfig = SIGLIP2_L16_384_VISION
    text: SiglipTextConfig = SIGLIP2_L16_384_TEXT

    text_pooling_output_dim: int = 512
    vision_pooling_output_dim: int = 512
    pooling_heads: int = 8
    pooling_layers: int = 4
    num_readouts: int = 1
    action_dim: int = 7
    history_length: int = 10  # trajectory length fed to the verifier
    traj_layers: int = 4       # TransformerEncoder num_layers
    traj_heads: int = 8
    use_transformer: bool = True
    action_padding_value: float = -5.0
    logit_scale_init: float = 2.6592
    tave_temperature_init: float = 0.07

    @property
    def fused_dim(self) -> int:
        return self.text_pooling_output_dim + self.vision_pooling_output_dim


def tiny_verifier_config() -> VerifierConfig:
    return VerifierConfig(
        vision=VitConfig(width=32, depth=2, mlp_dim=64, num_heads=4,
                         patch_size=16, image_size=64, gelu_approx=False),
        text=SiglipTextConfig(width=32, depth=2, mlp_dim=64, num_heads=4,
                              vocab_size=512, context_length=16, embed_dim=32),
        text_pooling_output_dim=16,
        vision_pooling_output_dim=16,
        pooling_heads=4,
        pooling_layers=2,
        traj_layers=2,
        traj_heads=4,
    )


# ---------------------------------------------------------------------------
# CoVer loop
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CoVerConfig:
    """Best-of-N verified control loop (run_simpler_eval_with_openpi.py:58-100)."""

    n_samples: int = 5            # policy_batch_inference_size
    n_rephrases: int = 8          # lang_rephrase_num (incl. the original)
    noise_std: float = 1.0
    rescore_threshold: float = 0.1  # stage-2 gate (:354)
    max_history: int = 6          # past verifier actions kept (eval_utils.py:208)
    gripper_vote: bool = True
    # candidate selection mode: "verifier" (two-stage verified selection,
    # the CoVer loop) | "random" (uniform over the K*N candidates) |
    # "first" (always candidate 0 == a single policy sample — the plain-pi0
    # baseline). The ablation axes of the reference's headline table
    # (README.md:136-155: pi0 vs pi0+CoVer); "random"/"first" skip the
    # verifier entirely.
    selection: str = "verifier"
    # Phase-aware deference (the stage-1 absolute-affinity gate of
    # run_simpler_eval_with_openpi.py:346-365 generalised into a
    # know-when-you-don't-know fallback): when the scene's fused
    # image+text embedding has cosine affinity below this threshold to
    # the checkpoint's ID calibration prototype
    # (verifier_params["calibration"]["prototype"], written by
    # `verification_scaling.py calibrate`), APPROACH-phase picks (gripper
    # still open) defer to candidate 0 — the policy prior — because
    # identifying the pick object in an unfamiliar scene is exactly what
    # low affinity says the verifier cannot do. CARRY-phase picks stay
    # verified: once the object is held, ranking is identity-free
    # geometry (move the held object to the receptacle). -inf disables.
    defer_threshold: float = float("-inf")

    @property
    def batch_size(self) -> int:
        return self.n_samples * self.n_rephrases


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


def fast_pi0_config(cfg: Pi0Config) -> Pi0Config:
    """Max-throughput variant: flash (pallas) tower MHA + shared-prefix
    decode kernel + reduced-precision score matmuls. Prefill stays "xla"
    (measured faster at bench shapes). Identical selected winners,
    bf16-level action deviation (cross-validated in tests)."""
    return replace(cfg, decode_attn_impl="pallas", fast_math=True,
                   vision=replace(cfg.vision, attn_impl="pallas",
                                  fast_math=True))


def fast_verifier_config(cfg: VerifierConfig) -> VerifierConfig:
    """Max-throughput verifier: flash tower MHA + fast-math scores."""
    return replace(cfg,
                   vision=replace(cfg.vision, attn_impl="pallas",
                                  fast_math=True),
                   text=replace(cfg.text, attn_impl="pallas",
                                fast_math=True))
