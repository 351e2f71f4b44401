"""Engine factory: checkpoint auto-detection + construction.

Parity with the reference's create_model pipeline
(cpmcu/common/utils.py:15-164): quantization detected from path keywords,
model family from config.json architectures (MiniCPM4 iff
layers/kv_heads == 16), family feature flags (qwen3 qk-norm, qwen2 attn
bias, minicpm4 sparse), FR-Spec vocab discovery, MiniCPM4 YARN injection —
then builds the TPU engine (Engine / SpecEngine) and loads weights through
io.hf_loader instead of per-tensor C calls.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import numpy as np

from ..core.config import EngineConfig, ModelConfig, minicpm4_yarn_rope
from .logging import logger

QUANT_KEYWORDS = ("marlin", "gptq", "quant", "awq", "int4", "int8", "w4a16", "qat")


def detect_quantization_from_path(model_path: Optional[str]) -> bool:
    if not model_path:
        return False
    low = model_path.lower()
    return any(k in low for k in QUANT_KEYWORDS)


def detect_model_type(model_path: str) -> str:
    """utils.py:33-63: family from architectures; MiniCPM4 iff
    num_hidden_layers / num_key_value_heads == 16."""
    try:
        with open(os.path.join(model_path, "config.json")) as f:
            config = json.load(f)
    except OSError:
        return "unknown"
    arch = (config.get("architectures") or [""])[0].lower()
    mt = (config.get("model_type") or "").lower()
    for fam in ("qwen2", "qwen3"):
        if fam in arch or fam in mt:
            return fam
    if "minicpm" in arch or "minicpm" in mt:
        layers = config.get("num_hidden_layers", 0)
        kvh = config.get("num_key_value_heads", 0)
        return "minicpm4" if kvh and layers / kvh == 16 else "minicpm"
    if "llama" in arch or "llama" in mt:
        return "llama"
    return "unknown"


def find_frspec_file(draft_path: Optional[str], frspec_path: Optional[str],
                     vocab_size: int) -> Optional[str]:
    """utils.py:83-99: explicit path, else freq_{size}.(npy|pt) next to the
    draft checkpoint."""
    if frspec_path and os.path.exists(frspec_path):
        return frspec_path
    if not draft_path or not vocab_size:
        return None
    for ext in ("npy", "pt"):
        cand = os.path.join(draft_path, f"freq_{vocab_size}.{ext}")
        if os.path.exists(cand):
            return cand
    return None


def load_frspec_ids(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path).astype(np.int32)
    import torch

    with open(path, "rb") as f:
        t = torch.load(f, weights_only=True)
    return np.asarray(t, dtype=np.int32)


def build_model_config(model_path: str, args: dict) -> Tuple[ModelConfig, str]:
    """ModelConfig from config.json + family flags + CLI overrides."""
    family = detect_model_type(model_path)
    quant = detect_quantization_from_path(model_path)
    apply_sparse = args.get("apply_sparse")
    if apply_sparse is None:
        apply_sparse = family == "minicpm4"

    overrides = dict(
        quant=quant,
        apply_sparse=apply_sparse,
        sink_window_size=args.get("sink_window_size", 1),
        block_window_size=args.get("block_window_size", 8),
        sparse_topk_k=args.get("sparse_topk_k", 64),
        sparse_switch=args.get("sparse_switch", 0),
        use_compress_lse=args.get("use_compress_lse", True),
    )
    if args.get("dtype"):
        overrides["dtype"] = args["dtype"]
    cfg = ModelConfig.from_pretrained(model_path, **overrides)

    if family == "qwen3" and not cfg.use_qk_norm:
        cfg = dataclasses.replace(cfg, use_qk_norm=True)
    if family == "qwen2" and not cfg.use_attn_bias:
        cfg = dataclasses.replace(cfg, use_attn_bias=True)
    if args.get("apply_yarn") and family == "minicpm4":
        cfg = dataclasses.replace(
            cfg, rope=minicpm4_yarn_rope(theta=cfg.rope.theta)
        )
    return cfg, family


def create_engine(args: dict):
    """Build a ready-to-generate engine from CLI-style args.

    Returns (engine, tokenizer). The reference's equivalent is
    utils.create_model + cli weight-loading stages (cli.py:250-342).
    """
    model_path = args["model_path"]
    draft_path = args.get("draft_model_path")

    with logger.stage(f"config {model_path}"):
        cfg, family = build_model_config(model_path, args)
        logger.info(f"model family: {family}, quant: {cfg.quant}, "
                    f"sparse: {cfg.apply_sparse}")

    eng = EngineConfig(
        chunk_length=args.get("chunk_length", 2048),
        memory_limit=args.get("memory_limit", 0.8),
        max_total_length=args.get("max_total_length", 0),
        temperature=args.get("temperature", 0.0),
        top_p=args.get("top_p", 1.0),
        top_k=args.get("top_k", 0),
        random_seed=args.get("random_seed", 0),
        decode_segment_size=args.get("decode_segment_size", 16),
        prefix_cache=args.get("prefix_cache", False),
        use_spec=draft_path is not None,
        spec_num_iter=args.get("spec_num_iter", 2),
        spec_topk_per_iter=args.get("spec_topk_per_iter", 10),
        spec_tree_size=args.get("spec_tree_size", 12),
        spec_window_size=args.get("spec_window_size", 1024),
        frspec_vocab_size=args.get("frspec_vocab_size", 0),
        tp_size=args.get("tp_size", 1),
        dp_size=args.get("dp_size", 1),
    )
    attn_impl = args.get("attn_impl", "auto")

    from ..io.hf_loader import load_params

    with logger.stage("load base weights"):
        params = load_params(model_path, cfg)

    tokenizer = None
    try:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_path)
    except Exception as e:  # tokenizer optional for raw-id workflows
        logger.warning(f"tokenizer unavailable: {e}")

    max_batch = args.get("max_batch", 0) or 0

    if draft_path is None:
        if max_batch:
            from ..engine.batch_engine import ContinuousBatchingEngine

            engine = ContinuousBatchingEngine(
                cfg, eng, params, max_batch=max_batch, attn_impl=attn_impl
            )
            return engine, tokenizer
        from ..engine.engine import Engine

        engine = Engine(cfg, eng, params, attn_impl=attn_impl)
        return engine, tokenizer

    if max_batch and cfg.apply_sparse:
        # batched EAGLE is dense-only (engine.batch_spec_engine); sparse
        # batched serving drops the drafter rather than the batching
        from ..engine.batch_engine import ContinuousBatchingEngine

        logger.warning(
            "batched speculation is dense-only: serving sparse continuous "
            "batching WITHOUT the draft model (single-sequence spec keeps "
            "the drafter: omit --max-batch)"
        )
        engine = ContinuousBatchingEngine(
            cfg, eng, params, max_batch=max_batch, attn_impl=attn_impl
        )
        return engine, tokenizer

    # --- speculative engine ---
    from ..engine.spec_engine import SpecEngine
    from ..io.hf_loader import load_eagle_params
    from ..spec.eagle import EagleConfig

    with open(os.path.join(draft_path, "config.json")) as f:
        dconf = json.load(f)

    # EAGLE version detection: explicit --spec-type, else config markers
    # (reference: args spec_type, utils.py:146 eagle_version)
    spec_type = args.get("spec_type", "auto")
    if spec_type == "auto":
        arch = " ".join(dconf.get("architectures") or []).lower()
        is_e3 = (
            "eagle3" in arch
            or "draft_vocab_size" in dconf
            or dconf.get("eagle_version") == 3
        )
        spec_type = "eagle3" if is_e3 else "eagle2"

    if spec_type == "eagle3":
        if max_batch:
            from ..engine.batch_engine import ContinuousBatchingEngine

            logger.warning(
                "batched speculation supports EAGLE-2 drafters only: "
                "serving continuous batching WITHOUT the EAGLE-3 drafter"
            )
            engine = ContinuousBatchingEngine(
                cfg, eng, params, max_batch=max_batch, attn_impl=attn_impl
            )
            return engine, tokenizer
        return _create_eagle3_engine(
            args, cfg, family, eng, params, tokenizer, draft_path, dconf,
            attn_impl,
        ), tokenizer
    draft_model = ModelConfig.from_hf_config(
        dconf, dtype=cfg.dtype,
        quant=detect_quantization_from_path(draft_path),
    )
    # drafter shares base dims/rope (eagle.py:34-45)
    draft_model = dataclasses.replace(
        draft_model,
        hidden_size=cfg.hidden_size,
        vocab_size=cfg.vocab_size,
        rope=cfg.rope if dconf.get("use_rope", True) else draft_model.rope,
        scale_residual=cfg.scale_residual if family in ("minicpm", "minicpm4")
        else draft_model.scale_residual,
        apply_sparse=False,
    )
    frspec_file = find_frspec_file(
        draft_path, args.get("frspec_path"), eng.frspec_vocab_size
    )
    frspec_size = eng.frspec_vocab_size if frspec_file else 0
    ecfg = EagleConfig(
        model=draft_model,
        num_iter=eng.spec_num_iter,
        topk_per_iter=eng.spec_topk_per_iter,
        tree_size=eng.spec_tree_size,
        window=eng.spec_window_size,
        frspec_vocab_size=frspec_size,
        use_input_norm=family in ("minicpm", "minicpm4"),
        use_attn_norm=family in ("minicpm", "minicpm4"),
    )
    remap = None
    if frspec_file:
        with logger.stage(f"frspec vocab {frspec_file}"):
            remap = load_frspec_ids(frspec_file)
    with logger.stage("load draft weights"):
        eparams = load_eagle_params(
            draft_path, cfg, ecfg, base_params=params, token_id_remap=remap
        )
    policy = args.get("batch_spec_policy", "auto")
    if max_batch and (policy == "off"
                      or (policy == "auto" and max_batch >= 2)):
        # measured crossover (PERF.md r4e): continuous batching already
        # amortizes the weight stream across slots, so per-slot tree
        # verify loses to plain batching at B>=2 on TPU — serve plain
        # slots and drop the drafter (--batch-spec-policy force keeps it)
        from ..engine.batch_engine import ContinuousBatchingEngine

        logger.warning(
            "batch_spec_policy=%s: serving PLAIN continuous batching "
            "(batched speculation measured slower than plain batching at "
            "max_batch>=2; pass --batch-spec-policy force to keep the "
            "batched EAGLE engine)" % policy
        )
        engine = ContinuousBatchingEngine(
            cfg, eng, params, max_batch=max_batch, attn_impl=attn_impl
        )
        return engine, tokenizer
    if max_batch:
        # batched EAGLE-2: speculative continuous batching. The batched
        # drafter has no sliding-window path yet — force full draft
        # attention (affects draft quality at very long contexts only).
        from ..engine.batch_spec_engine import BatchSpecEngine

        if ecfg.window:
            logger.warning(
                "batched EAGLE ignores --spec-window-size (full draft "
                "attention)"
            )
            ecfg = dataclasses.replace(ecfg, window=0)
        engine = BatchSpecEngine(
            cfg, ecfg, eng, params, eparams,
            max_batch=max_batch, attn_impl=attn_impl,
        )
        return engine, tokenizer
    engine = SpecEngine(cfg, ecfg, eng, params, eparams, attn_impl=attn_impl)
    return engine, tokenizer


def _create_eagle3_engine(args, cfg, family, eng, params, tokenizer,
                          draft_path, dconf, attn_impl):
    """EAGLE-3 branch of create_engine (reference eagle_version==3 path,
    cpmcu/speculative/eagle.py:70-116)."""
    from ..engine.eagle3_engine import Eagle3Engine
    from ..io.hf_loader import load_eagle3_params
    from ..spec.eagle3 import Eagle3Config

    draft_vocab = dconf.get("draft_vocab_size", cfg.vocab_size)
    draft_model = ModelConfig.from_hf_config(
        {**dconf, "vocab_size": draft_vocab}, dtype=cfg.dtype
    )
    draft_model = dataclasses.replace(
        draft_model,
        num_layers=1,
        hidden_size=cfg.hidden_size,
        rope=cfg.rope,
        scale_residual=cfg.scale_residual if family in ("minicpm", "minicpm4")
        else draft_model.scale_residual,
        apply_sparse=False,
    )
    L = cfg.num_layers
    tap_layers = tuple(
        dconf.get("eagle3_layers_to_capture")
        or (2, L // 2, L - 3)  # reference default {2,16,29} of 32, model.cuh:51
    )
    ecfg = Eagle3Config(
        model=draft_model,
        num_iter=eng.spec_num_iter,
        topk_per_iter=eng.spec_topk_per_iter,
        tree_size=eng.spec_tree_size,
        window=eng.spec_window_size,
        tap_layers=tap_layers,
    )
    with logger.stage("load eagle3 draft weights"):
        eparams = load_eagle3_params(
            draft_path, cfg, ecfg,
            d2t_is_offset=bool(args.get("d2t_is_offset", False)),
        )
    return Eagle3Engine(cfg, ecfg, eng, params, eparams, attn_impl=attn_impl)
