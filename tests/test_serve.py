"""Serving layer: args, factory auto-detection, checkpoint loading via the
factory, dataset benchmark plumbing, and the OpenAI server end-to-end."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # serve HTTP/SSE e2e over real engines (heavy tier, VERDICT r4 task 7)

import jax

from cpmcu_tpu.serve.args import make_cli_parser, make_server_parser


# ---------------------------------------------------------------------------
# args
# ---------------------------------------------------------------------------


def test_cli_args_defaults_match_reference():
    args = vars(make_cli_parser().parse_args(["--model-path", "/m"]))
    # reference defaults (cpmcu/common/args.py)
    assert args["chunk_length"] == 2048
    assert args["spec_num_iter"] == 2
    assert args["spec_topk_per_iter"] == 10
    assert args["spec_tree_size"] == 12
    assert args["spec_window_size"] == 1024
    assert args["frspec_vocab_size"] == 32768
    assert args["sink_window_size"] == 1
    assert args["block_window_size"] == 8
    assert args["sparse_topk_k"] == 64
    assert args["sparse_switch"] == 0
    assert args["use_compress_lse"] is True


def test_snake_and_kebab_aliases():
    a = vars(make_cli_parser().parse_args(
        ["--model-path", "/m", "--chunk-length", "64"]))
    b = vars(make_cli_parser().parse_args(
        ["--model_path", "/m", "--chunk_length", "64"]))
    assert a["chunk_length"] == b["chunk_length"] == 64


def test_server_args():
    args = vars(make_server_parser().parse_args(
        ["--model-path", "/m", "--port", "9999"]))
    assert args["port"] == 9999 and args["host"] == "0.0.0.0"


# ---------------------------------------------------------------------------
# factory detection
# ---------------------------------------------------------------------------


def test_detect_quantization_from_path():
    from cpmcu_tpu.serve.factory import detect_quantization_from_path as d

    assert d("/models/MiniCPM4-8B-marlin-cpmcu")
    assert d("/models/foo-GPTQ")
    assert d("/models/bar-W4A16")
    assert not d("/models/MiniCPM4-8B")
    assert not d(None)


def _write_config(tmp_path, **kw):
    cfg = dict(
        architectures=["MiniCPMForCausalLM"], model_type="minicpm",
        hidden_size=32, intermediate_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, vocab_size=128,
        rms_norm_eps=1e-5, rope_theta=10000.0, torch_dtype="float32",
    )
    cfg.update(kw)
    with open(os.path.join(tmp_path, "config.json"), "w") as f:
        json.dump(cfg, f)
    return cfg


def test_detect_model_type(tmp_path):
    from cpmcu_tpu.serve.factory import detect_model_type

    d = str(tmp_path)
    _write_config(d, num_hidden_layers=32, num_key_value_heads=2)
    assert detect_model_type(d) == "minicpm4"  # 32/2 == 16
    _write_config(d, num_hidden_layers=2, num_key_value_heads=2)
    assert detect_model_type(d) == "minicpm"
    _write_config(d, architectures=["Qwen3ForCausalLM"], model_type="qwen3")
    assert detect_model_type(d) == "qwen3"
    _write_config(d, architectures=["LlamaForCausalLM"], model_type="llama")
    assert detect_model_type(d) == "llama"


# ---------------------------------------------------------------------------
# factory end-to-end with a synthetic checkpoint
# ---------------------------------------------------------------------------


def _write_tiny_checkpoint(dirpath):
    """Tiny llama-format safetensors checkpoint the factory can load."""
    from safetensors.numpy import save_file

    cfg = _write_config(dirpath, tie_word_embeddings=False)
    rng = np.random.default_rng(0)
    H, I, V = cfg["hidden_size"], cfg["intermediate_size"], cfg["vocab_size"]
    Hq = Hkv = None
    heads, kvh = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    D = H // heads
    Hq, Hkv = heads * D, kvh * D

    def w(*shape):
        return (rng.normal(size=shape) * 0.02).astype(np.float32)

    t = {"model.embed_tokens.weight": w(V, H),
         "model.norm.weight": np.ones(H, np.float32),
         "lm_head.weight": w(V, H)}
    for l in range(cfg["num_hidden_layers"]):
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


class FakeTokenizer:
    """Minimal tokenizer for server tests (no HF assets in this image)."""

    chat_template = None
    eos_token_id = 0

    def encode(self, text):
        return [(ord(c) % 127) + 1 for c in text][:64]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr((i - 1) % 26 + 97) for i in ids)

    def apply_chat_template(self, msgs, add_generation_prompt=True, tokenize=True):
        return self.encode("\n".join(m["content"] for m in msgs))


@pytest.fixture(scope="module")
def tiny_engine(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpt"))
    _write_tiny_checkpoint(d)
    from cpmcu_tpu.serve.factory import create_engine

    engine, tokenizer = create_engine({
        "model_path": d, "chunk_length": 32, "max_total_length": 256,
        "attn_impl": "xla", "decode_segment_size": 4,
    })
    return engine, tokenizer


def test_factory_creates_working_engine(tiny_engine):
    engine, _ = tiny_engine
    toks, _, _ = engine.generate([1, 2, 3, 4], generation_length=8)
    assert len(toks) == 8
    assert engine.cfg.apply_sparse is False  # 2/2 != 16 -> plain minicpm


def test_factory_max_batch_dispatch(tmp_path_factory):
    """create_engine(max_batch=N) returns the continuous-batching engine
    (the server's --max-batch path goes through the factory now)."""
    from cpmcu_tpu.engine.batch_engine import ContinuousBatchingEngine
    from cpmcu_tpu.serve.factory import create_engine

    d = str(tmp_path_factory.mktemp("ckpt_mb"))
    _write_tiny_checkpoint(d)
    engine, _ = create_engine({
        "model_path": d, "chunk_length": 32, "max_total_length": 256,
        "attn_impl": "xla", "max_batch": 2,
    })
    assert isinstance(engine, ContinuousBatchingEngine)
    rid = engine.submit([1, 2, 3], max_new_tokens=4)
    out = engine.run()
    assert len(out[rid]) == 4


# ---------------------------------------------------------------------------
# benchmark plumbing
# ---------------------------------------------------------------------------


def test_dataset_loader_and_summary(tmp_path, tiny_engine):
    from cpmcu_tpu.serve.benchmark import (
        load_dataset, run_dataset_evaluation, save_results, summarize_results,
    )

    ds = tmp_path / "mini.jsonl"
    with open(ds, "w") as f:
        f.write(json.dumps({"question_id": 1, "category": "t",
                            "turns": ["hello there", "and again"]}) + "\n")
        f.write(json.dumps({"question_id": 2, "turns": ["short one"]}) + "\n")

    questions, n = load_dataset("mtbench", str(ds))
    assert n == 2 and questions[0]["turns"][1] == "and again"

    engine, _ = tiny_engine
    engine.reset()
    results = run_dataset_evaluation(
        engine, FakeTokenizer(), questions, generation_length=4,
        use_chat_template=False,
    )
    assert len(results) == 2
    summary = summarize_results(results)
    assert summary["num_turns"] == 3
    assert summary["mean_decode_tok_s"] > 0

    out = save_results(results, str(tmp_path / "res"), "mtbench", "tiny/model")
    with open(out) as f:
        saved = json.load(f)
    assert saved["summary"]["num_questions"] == 2


# ---------------------------------------------------------------------------
# OpenAI server (stdlib backend) end-to-end
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def server(tiny_engine):
    from cpmcu_tpu.serve.server import ChatBackend, make_stdlib_server

    engine, _ = tiny_engine
    backend = ChatBackend(engine, FakeTokenizer(), model_name="tiny")
    httpd = make_stdlib_server(backend, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=120)


def test_server_health_and_models(server):
    with urllib.request.urlopen(server + "/health", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "healthy"
    with urllib.request.urlopen(server + "/v1/models", timeout=30) as r:
        models = json.loads(r.read())
    assert models["data"][0]["id"] == "tiny"


def test_server_chat_completion(server):
    with _post(server + "/v1/chat/completions", {
        "model": "tiny", "max_tokens": 6,
        "messages": [{"role": "user", "content": "hi"}],
    }) as r:
        out = json.loads(r.read())
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["role"] == "assistant"
    assert out["usage"]["completion_tokens"] <= 6


def test_server_chat_stream(server):
    with _post(server + "/v1/chat/completions", {
        "model": "tiny", "max_tokens": 6, "stream": True,
        "messages": [{"role": "user", "content": "hi"}],
    }) as r:
        body = r.read().decode()
    events = [l[6:] for l in body.splitlines() if l.startswith("data: ")]
    assert events[-1] == "[DONE]"
    first = json.loads(events[0])
    assert first["object"] == "chat.completion.chunk"
    finals = [json.loads(e) for e in events[:-1]]
    assert finals[-1]["choices"][0]["finish_reason"] in ("stop", "length")


def test_server_rejects_bad_request(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server + "/v1/chat/completions", {"model": "tiny", "messages": []})
    assert ei.value.code == 400


# ---------------------------------------------------------------------------
# continuous-batching server backend
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def batch_server(tiny_engine):
    from cpmcu_tpu.core.config import EngineConfig
    from cpmcu_tpu.engine.batch_engine import ContinuousBatchingEngine
    from cpmcu_tpu.serve.batch_backend import BatchChatBackend
    from cpmcu_tpu.serve.server import make_stdlib_server

    engine, _ = tiny_engine
    be = ContinuousBatchingEngine(
        engine.cfg, EngineConfig(chunk_length=32, max_total_length=512),
        engine.params, max_batch=4, attn_impl="xla",
    )
    backend = BatchChatBackend(be, FakeTokenizer(), model_name="tiny-batch")
    httpd = make_stdlib_server(backend, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def test_batch_server_concurrent_requests(batch_server):
    """Concurrent HTTP requests decode together through the scheduler."""
    import concurrent.futures

    def ask(i):
        with _post(batch_server + "/v1/chat/completions", {
            "model": "tiny-batch", "max_tokens": 6,
            "messages": [{"role": "user", "content": f"prompt {i}"}],
        }) as r:
            return json.loads(r.read())

    with concurrent.futures.ThreadPoolExecutor(max_workers=3) as ex:
        outs = list(ex.map(ask, range(3)))
    for out in outs:
        assert out["object"] == "chat.completion"
        assert out["usage"]["completion_tokens"] >= 1


def test_batch_server_stream(batch_server):
    with _post(batch_server + "/v1/chat/completions", {
        "model": "tiny-batch", "max_tokens": 5, "stream": True,
        "messages": [{"role": "user", "content": "hello"}],
    }) as r:
        body = r.read().decode()
    events = [l[6:] for l in body.splitlines() if l.startswith("data: ")]
    assert events[-1] == "[DONE]"


@pytest.fixture(scope="module")
def spec_batch_server(tiny_engine):
    """OpenAI server over the batched EAGLE-2 engine (speculative
    continuous batching in the serving path)."""
    import dataclasses as dc

    import jax

    from cpmcu_tpu.core.config import EngineConfig
    from cpmcu_tpu.engine.batch_spec_engine import BatchSpecEngine
    from cpmcu_tpu.serve.batch_backend import BatchChatBackend
    from cpmcu_tpu.serve.server import make_stdlib_server
    from cpmcu_tpu.spec.eagle import EagleConfig, init_eagle_params

    engine, _ = tiny_engine
    dcfg = dc.replace(engine.cfg, num_layers=1)
    ecfg = EagleConfig(model=dcfg, num_iter=2, topk_per_iter=3, tree_size=6)
    eparams = init_eagle_params(ecfg, jax.random.PRNGKey(5))
    be = BatchSpecEngine(
        engine.cfg, ecfg, EngineConfig(chunk_length=32, max_total_length=512),
        engine.params, eparams, max_batch=2, attn_impl="xla",
    )
    backend = BatchChatBackend(be, FakeTokenizer(), model_name="tiny-spec")
    httpd = make_stdlib_server(backend, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def test_spec_batch_server_concurrent(spec_batch_server):
    """Concurrent requests decode through speculative rounds (the pump
    drives BatchSpecEngine.step(); each round can emit several tokens)."""
    import concurrent.futures

    def ask(i):
        with _post(spec_batch_server + "/v1/chat/completions", {
            "model": "tiny-spec", "max_tokens": 8,
            "messages": [{"role": "user", "content": f"prompt {i}"}],
        }) as r:
            return json.loads(r.read())

    with concurrent.futures.ThreadPoolExecutor(max_workers=2) as ex:
        outs = list(ex.map(ask, range(2)))
    for out in outs:
        assert out["object"] == "chat.completion"
        assert 1 <= out["usage"]["completion_tokens"] <= 8


def test_batch_server_mixed_temperatures(batch_server):
    """Two concurrent requests with DIFFERENT temperatures batch together:
    per-slot sampling vectors (ops.sampling.sample_per_row) instead of the
    engine-global statics (VERDICT round-1 weak #7)."""
    import concurrent.futures

    def ask(temp):
        with _post(batch_server + "/v1/chat/completions", {
            "model": "tiny-batch", "max_tokens": 8, "temperature": temp,
            "messages": [{"role": "user", "content": "mix"}],
        }) as r:
            return json.loads(r.read())

    with concurrent.futures.ThreadPoolExecutor(max_workers=2) as ex:
        outs = list(ex.map(ask, [0.0, 1.3]))
    for out in outs:
        assert out["object"] == "chat.completion"
        assert out["usage"]["completion_tokens"] >= 1

    # greedy (temp=0) must be deterministic even in a mixed batch
    a = ask(0.0)["choices"][0]["message"]["content"]
    b = ask(0.0)["choices"][0]["message"]["content"]
    assert a == b


def test_per_slot_sampling_greedy_matches_static():
    """sample_per_row with temp=0 rows equals argmax; high-temp rows stay
    within the top-k/top-p support."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cpmcu_tpu.ops.sampling import sample_per_row

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    out = np.asarray(sample_per_row(
        logits, key,
        jnp.asarray([0.0, 0.0, 2.0, 1.0], jnp.float32),
        jnp.asarray([0, 0, 3, 0], jnp.int32),
        jnp.asarray([1.0, 1.0, 1.0, 0.5], jnp.float32),
    ))
    ref = np.asarray(jnp.argmax(logits, axis=-1))
    assert out[0] == ref[0] and out[1] == ref[1]
    # row 2: top-k=3 restricts support to the 3 largest logits
    top3 = set(np.argsort(np.asarray(logits)[2])[-3:].tolist())
    assert out[2] in top3


# ---------------------------------------------------------------------------
# OpenAI stop sequences (reference: cpmcu/server.py:134-152)
# ---------------------------------------------------------------------------


def _greedy_text(server, max_tokens=12):
    with _post(server + "/v1/chat/completions", {
        "model": "tiny", "max_tokens": max_tokens,
        "messages": [{"role": "user", "content": "hi"}],
    }) as r:
        return json.loads(r.read())["choices"][0]["message"]["content"]


def test_server_stop_sequence(server):
    full = _greedy_text(server)
    assert len(full) >= 4
    stop = full[2:4]
    with _post(server + "/v1/chat/completions", {
        "model": "tiny", "max_tokens": 12, "stop": stop,
        "messages": [{"role": "user", "content": "hi"}],
    }) as r:
        out = json.loads(r.read())
    c = out["choices"][0]
    assert c["finish_reason"] == "stop"
    assert c["message"]["content"] == full[: full.index(stop)]
    assert stop not in c["message"]["content"]


def test_server_stop_sequence_stream(server):
    full = _greedy_text(server)
    stop = full[2:4]
    with _post(server + "/v1/chat/completions", {
        "model": "tiny", "max_tokens": 12, "stream": True,
        "stop": [stop],
        "messages": [{"role": "user", "content": "hi"}],
    }) as r:
        body = r.read().decode()
    events = [json.loads(l[6:]) for l in body.splitlines()
              if l.startswith("data: ") and l != "data: [DONE]"]
    text = "".join(e["choices"][0]["delta"].get("content", "")
                   for e in events)
    assert text == full[: full.index(stop)]
    assert events[-1]["choices"][0]["finish_reason"] == "stop"


def test_batch_server_stop_sequence(batch_server):
    full = _greedy_text(batch_server)
    assert len(full) >= 4
    stop = full[2:4]
    with _post(batch_server + "/v1/chat/completions", {
        "model": "tiny", "max_tokens": 12, "stop": stop,
        "messages": [{"role": "user", "content": "hi"}],
    }) as r:
        out = json.loads(r.read())
    c = out["choices"][0]
    assert c["finish_reason"] == "stop"
    assert c["message"]["content"] == full[: full.index(stop)]


def test_stop_param_validation():
    from cpmcu_tpu.serve.openai_api import ChatCompletionRequest

    base = {"model": "m", "messages": [{"role": "user", "content": "x"}]}
    r = ChatCompletionRequest.from_dict({**base, "stop": "###"})
    assert r.stop == ["###"]
    with pytest.raises(ValueError):
        ChatCompletionRequest.from_dict({**base, "stop": list("abcde")})
    with pytest.raises(ValueError):
        ChatCompletionRequest.from_dict({**base, "stop": 3})
