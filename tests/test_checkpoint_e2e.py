"""Turnkey checkpoint drill (VERDICT r3 task 9): fabricate a GPTQ
safetensors checkpoint directory on disk — sharded index.json, AutoGPTQ
tensor layout, quantization_config, EAGLE draft dir with an FR-Spec
freq_*.pt — and load it through the full production path
(serve/factory.create_engine -> io/hf_loader -> native repack), then
generate. Mirrors the reference's load pipeline
(cpmcu/llm.py:118-192, scripts/model_convert/gptq2marlin.py:86-95).

Dims are MiniCPM4-shaped (layers/kv_heads == 16 triggers the family
detection; K dims are KCHUNK-aligned like the 8B) but scaled down so the
CPU suite stays fast. tools/checkpoint_drill.py runs the same drill at
full 8B dims and records the load-time budget (PERF.md).
"""

import json
import os
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # fabricated-GPTQ checkpoint drill (heavy tier, VERDICT r4 task 7)

from cpmcu_tpu.ops.quant import GROUP_SIZE

L, H, NH, KVH, D, I, V = 16, 1024, 16, 1, 64, 2048, 1024
VFR = 256


def _gptq_pack(rng, K, N):
    """AutoGPTQ tensor set for a random sym int4 weight."""
    q4 = rng.integers(0, 16, size=(K, N), dtype=np.int32)
    qw = np.zeros((K // 8, N), np.uint32)
    for j in range(8):
        qw |= q4[j::8].astype(np.uint32) << (4 * j)
    scales = rng.uniform(0.005, 0.02, size=(K // GROUP_SIZE, N)).astype(
        np.float16)
    qzeros = np.full((K // GROUP_SIZE, N // 8), 0x88888888,
                     np.uint32).astype(np.int32)
    g_idx = np.repeat(np.arange(K // GROUP_SIZE), GROUP_SIZE).astype(np.int32)
    return {"qweight": qw.astype(np.int32), "qzeros": qzeros,
            "scales": scales, "g_idx": g_idx}


def fabricate_base(dirpath):
    """Sharded GPTQ checkpoint: layers 0..L/2 in shard 1, rest + top-level
    tensors in shard 2, with a *.safetensors.index.json weight map."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    os.makedirs(dirpath, exist_ok=True)
    cfgj = {
        "architectures": ["MiniCPMForCausalLM"],
        "model_type": "minicpm",
        "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": NH,
        "num_key_value_heads": KVH, "head_dim": D,
        "vocab_size": V, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "torch_dtype": "bfloat16",
        "scale_emb": 12.0, "dim_model_base": 256,
        "scale_depth": 1.4,
        "quantization_config": {
            "bits": 4, "group_size": GROUP_SIZE, "sym": True,
            "quant_method": "gptq", "desc_act": False,
        },
    }
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump(cfgj, f)

    import ml_dtypes

    def bf16(a):
        return np.asarray(a, np.float32).astype(ml_dtypes.bfloat16)

    shards = [{}, {}]
    wmap = {}
    lin_dims = {
        "self_attn.q_proj": (H, NH * D), "self_attn.k_proj": (H, KVH * D),
        "self_attn.v_proj": (H, KVH * D), "self_attn.o_proj": (NH * D, H),
        "mlp.gate_proj": (H, I), "mlp.up_proj": (H, I),
        "mlp.down_proj": (I, H),
    }
    for li in range(L):
        sh = 0 if li < L // 2 else 1
        pre = f"model.layers.{li}."
        for lin, (K, N) in lin_dims.items():
            for leaf, arr in _gptq_pack(rng, K, N).items():
                name = f"{pre}{lin}.{leaf}"
                shards[sh][name] = arr
                wmap[name] = f"model-0000{sh + 1}-of-00002.safetensors"
        for nrm in ("input_layernorm.weight",
                    "post_attention_layernorm.weight"):
            name = f"{pre}{nrm}"
            shards[sh][name] = bf16(np.ones(H))
            wmap[name] = f"model-0000{sh + 1}-of-00002.safetensors"
    for name, arr in {
        "model.embed_tokens.weight": bf16(rng.standard_normal((V, H)) * 0.02),
        "model.norm.weight": bf16(np.ones(H)),
        "lm_head.weight": bf16(rng.standard_normal((V, H)) * 0.02),
    }.items():
        shards[1][name] = arr
        wmap[name] = "model-00002-of-00002.safetensors"

    for i, sh in enumerate(shards):
        save_file(sh, os.path.join(dirpath,
                                   f"model-0000{i + 1}-of-00002.safetensors"))
    with open(os.path.join(dirpath,
                           "model.safetensors.index.json"), "w") as f:
        json.dump({"weight_map": wmap}, f)


def fabricate_draft(dirpath):
    """EAGLE-2 drafter dir: fused fc.weight split, 1 decoder layer,
    input norms, and an FR-Spec freq_{VFR}.pt next to it."""
    from safetensors.numpy import save_file

    import ml_dtypes

    rng = np.random.default_rng(1)
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump({
            "architectures": ["LlamaForCausalLM"],
            "hidden_size": H, "intermediate_size": I,
            "num_hidden_layers": 1, "num_attention_heads": NH,
            "num_key_value_heads": KVH, "head_dim": D,
            "vocab_size": V, "rms_norm_eps": 1e-5,
            "rope_theta": 10000.0, "torch_dtype": "bfloat16",
        }, f)

    def bf16(a):
        return np.asarray(a, np.float32).astype(ml_dtypes.bfloat16)

    t = {
        "fc.weight": bf16(rng.standard_normal((H, 2 * H)) * 0.02),
        "fc.bias": bf16(np.zeros(H)),
        "input_norm1.weight": bf16(np.ones(H)),
        "input_norm2.weight": bf16(np.ones(H)),
        "model.layers.0.input_layernorm.weight": bf16(np.ones(H)),
        "model.layers.0.post_attention_layernorm.weight": bf16(np.ones(H)),
    }
    lin_dims = {
        "self_attn.q_proj": (NH * D, H), "self_attn.k_proj": (KVH * D, H),
        "self_attn.v_proj": (KVH * D, H), "self_attn.o_proj": (H, NH * D),
        "mlp.gate_proj": (I, H), "mlp.up_proj": (I, H),
        "mlp.down_proj": (H, I),
    }
    for lin, shape in lin_dims.items():  # torch (out, in) layout
        t[f"model.layers.0.{lin}.weight"] = bf16(
            rng.standard_normal(shape) * 0.02)
    save_file(t, os.path.join(dirpath, "model.safetensors"))

    import torch

    torch.save(torch.arange(VFR, dtype=torch.int32),
               os.path.join(dirpath, f"freq_{VFR}.pt"))


@pytest.mark.parametrize("with_draft", [False, True])
def test_checkpoint_e2e(tmp_path, with_draft):
    base = str(tmp_path / "minicpm-gptq-marlin")  # quant path keywords
    fabricate_base(base)
    args = {
        "model_path": base, "chunk_length": 64, "max_total_length": 512,
        "apply_sparse": False,
    }
    if with_draft:
        draft = str(tmp_path / "eagle-draft")
        fabricate_draft(draft)
        args.update(draft_model_path=draft, frspec_vocab_size=VFR,
                    spec_tree_size=8, spec_topk_per_iter=4,
                    spec_window_size=0)

    from cpmcu_tpu.serve.factory import create_engine

    t0 = time.time()
    engine, _tok = create_engine(args)
    load_s = time.time() - t0

    assert engine.cfg.quant, "path keywords must force W4A16"
    assert engine.cfg.num_layers == L
    # single-chip engines fuse wq|wk|wv -> wqkv (llama.fuse_projections)
    q = engine.params["layers"].get("wqkv") or engine.params["layers"]["wq"]
    assert "q" in q and "s" in q, "GPTQ tensors must repack to {'q','s'}"
    if with_draft:
        from cpmcu_tpu.engine.spec_engine import SpecEngine

        assert isinstance(engine, SpecEngine)
        assert engine.eparams["token_id_remap"].shape[0] == VFR
        assert engine.eparams["lm_head"]["w"].shape[1] == VFR

    toks, _, _ = engine.generate([3, 1, 4, 1, 5, 9], generation_length=6)
    assert len(toks) == 6
    assert all(0 <= t < V for t in toks)
    # load-time observability for the PERF.md budget (full-dims drill:
    # tools/checkpoint_drill.py)
    print(f"checkpoint load: {load_s:.2f}s")


def test_batch_spec_policy_dispatch(tmp_path):
    """--batch-spec-policy: 'auto' serves PLAIN continuous batching at
    max_batch>=2 (measured crossover, PERF.md r4e — batching already
    amortizes the weight stream, per-slot tree verify loses), 'force'
    keeps the batched EAGLE engine."""
    base = str(tmp_path / "minicpm-gptq-marlin")
    fabricate_base(base)
    draft = str(tmp_path / "eagle-draft")
    fabricate_draft(draft)
    args = {
        "model_path": base, "chunk_length": 64, "max_total_length": 512,
        "apply_sparse": False, "draft_model_path": draft,
        "frspec_vocab_size": VFR, "spec_tree_size": 8,
        "spec_topk_per_iter": 4, "spec_window_size": 0, "max_batch": 2,
    }
    from cpmcu_tpu.engine.batch_engine import ContinuousBatchingEngine
    from cpmcu_tpu.engine.batch_spec_engine import BatchSpecEngine
    from cpmcu_tpu.serve.factory import create_engine

    engine, _ = create_engine(dict(args))
    assert isinstance(engine, ContinuousBatchingEngine)
    assert not isinstance(engine, BatchSpecEngine)

    engine, _ = create_engine(dict(args, batch_spec_policy="force"))
    assert isinstance(engine, BatchSpecEngine)
    rid = engine.submit([1, 2, 3], max_new_tokens=4)
    assert len(engine.run()[rid]) == 4
