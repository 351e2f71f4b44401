"""CLI pipeline (run_generation) against a synthetic checkpoint.

The reference's integration tests run ``python -m cpmcu.cli`` as a
subprocess against real HF downloads (tests/test_model_generation.py);
with no model hub access here, the pipeline runs in-process against the
synthetic checkpoint with a stubbed tokenizer."""

import json
import os

import numpy as np
import pytest


def _write_tiny_checkpoint(dirpath):
    from safetensors.numpy import save_file

    cfg = dict(
        architectures=["MiniCPMForCausalLM"], model_type="minicpm",
        hidden_size=32, intermediate_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, vocab_size=128,
        rms_norm_eps=1e-5, rope_theta=10000.0, torch_dtype="float32",
        tie_word_embeddings=False,
    )
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump(cfg, f)
    rng = np.random.default_rng(0)
    H, I, V = 32, 64, 128
    Hq, Hkv = 32, 16

    def w(*shape):
        return (rng.normal(size=shape) * 0.02).astype(np.float32)

    t = {"model.embed_tokens.weight": w(V, H),
         "model.norm.weight": np.ones(H, np.float32),
         "lm_head.weight": w(V, H)}
    for l in range(2):
        p = f"model.layers.{l}."
        t[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "self_attn.q_proj.weight"] = w(Hq, H)
        t[p + "self_attn.k_proj.weight"] = w(Hkv, H)
        t[p + "self_attn.v_proj.weight"] = w(Hkv, H)
        t[p + "self_attn.o_proj.weight"] = w(H, Hq)
        t[p + "mlp.gate_proj.weight"] = w(I, H)
        t[p + "mlp.up_proj.weight"] = w(I, H)
        t[p + "mlp.down_proj.weight"] = w(H, I)
    save_file(t, os.path.join(dirpath, "model.safetensors"))


class StubTokenizer:
    chat_template = None
    eos_token_id = 0

    def encode(self, text):
        return [(ord(c) % 127) + 1 for c in text][:48]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr((i - 1) % 26 + 97) for i in ids)


def test_cli_run_generation(tmp_path, monkeypatch, capsys):
    d = str(tmp_path)
    _write_tiny_checkpoint(d)

    # route AutoTokenizer to the stub (no hub access in this image)
    import transformers

    monkeypatch.setattr(
        transformers.AutoTokenizer, "from_pretrained",
        classmethod(lambda cls, *a, **k: StubTokenizer()),
    )

    from cpmcu_tpu.serve.cli import run_generation

    rc = run_generation({
        "model_path": d,
        "prompt_text": "hello world",
        "generation_length": 8,
        "use_stream": True,
        "chunk_length": 32,
        "max_total_length": 256,
        "attn_impl": "xla",
        "decode_segment_size": 4,
    })
    assert rc == 0
    out = capsys.readouterr().out
    assert len(out.strip()) > 0  # streamed some text


def test_cli_batch_mode(tmp_path, monkeypatch, capsys):
    d = str(tmp_path)
    _write_tiny_checkpoint(d)
    import transformers

    monkeypatch.setattr(
        transformers.AutoTokenizer, "from_pretrained",
        classmethod(lambda cls, *a, **k: StubTokenizer()),
    )
    from cpmcu_tpu.serve.cli import run_generation

    rc = run_generation({
        "model_path": d,
        "prompt_text": "hi",
        "generation_length": 6,
        "use_stream": False,
        "chunk_length": 32,
        "max_total_length": 256,
        "attn_impl": "xla",
    })
    assert rc == 0
