"""HF checkpoint ingestion: safetensors/bin -> stacked param pytree.

Replaces the reference's per-tensor pybind streaming path
(cpmcu/llm.py:118-192 -> C.load_model -> cudaMemcpy): tensors are read on
host, name-mapped, stacked along the layer dim, and placed on device in one
``jax.device_put`` per leaf (optionally with a NamedSharding so multi-chip
placement happens during load, not after).

Handles the same name mangling the reference does: fused ``gate_up_proj`` /
``qkv_proj`` splits (llm.py:126-131), tied embeddings (llm.py:136-137), and
MiniCPM/Llama/Qwen naming.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ModelConfig

_TORCH_DT = {"F32": np.float32, "F16": np.float16, "BF16": None, "I32": np.int32, "I64": np.int64}


def iter_checkpoint_tensors(path: str):
    """Yield (name, np.ndarray) from a HF checkpoint directory.

    Mirrors the reference's file discovery (llm.py:140-176): prefer
    ``*.index.json`` weight maps, else a single safetensors/bin/pt file.
    """
    index_files = sorted(
        glob.glob(os.path.join(path, "*.safetensors.index.json"))
    ) + sorted(glob.glob(os.path.join(path, "*.bin.index.json")))
    if index_files:
        with open(index_files[0]) as f:
            file_list = sorted(set(json.load(f)["weight_map"].values()))
        file_list = [os.path.join(path, f) for f in file_list]
    else:
        for pattern in ("*.safetensors", "*.bin", "*.pt"):
            file_list = sorted(glob.glob(os.path.join(path, pattern)))
            if file_list:
                break
        else:
            raise ValueError(f"No supported checkpoint file found in {path}")

    for file in file_list:
        if file.endswith(".safetensors"):
            # prefer the native zero-copy mmap reader (csrc/stloader.cc).
            # Open + dtype-validate BEFORE yielding anything: once tensors
            # have been consumed, falling back to safe_open would re-yield
            # them (ADVICE.md round-1).
            nf = None
            try:
                from .native import NativeSafetensors

                nf = NativeSafetensors(file)
                nf.validate_dtypes()
            except (RuntimeError, OSError, KeyError, ValueError):
                if nf is not None:
                    nf.close()
                nf = None
            if nf is not None:
                with nf:
                    for name in nf.keys():
                        # materialize: the zero-copy view dies with the mmap
                        yield name, nf.get(name).copy()
                continue
            from safetensors import safe_open

            with safe_open(file, framework="np") as f:
                for name in f.keys():
                    try:
                        yield name, f.get_tensor(name)
                    except (TypeError, ValueError):
                        # bf16 unsupported by numpy framework path: go via torch
                        import torch
                        from safetensors.torch import load_file

                        t = load_file(file)[name]
                        yield name, _torch_to_np(t)
        else:
            import torch

            ckpt = torch.load(file, map_location="cpu", weights_only=True)
            for name, t in ckpt.items():
                yield name, _torch_to_np(t)


def _torch_to_np(t) -> np.ndarray:
    import torch

    if t.dtype == torch.bfloat16:
        # keep bf16 bits; ml_dtypes view on the uint16 payload
        import ml_dtypes

        return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
    return t.numpy()


# ---------------------------------------------------------------------------
# name mapping
# ---------------------------------------------------------------------------

_LAYER_RE = re.compile(r"model\.layers\.(\d+)\.(.+)")

_SUB_MAP = {
    "input_layernorm.weight": ("attn_norm", None),
    "self_attn.q_proj.weight": ("wq", "w"),
    "self_attn.k_proj.weight": ("wk", "w"),
    "self_attn.v_proj.weight": ("wv", "w"),
    "self_attn.o_proj.weight": ("wo", "w"),
    "self_attn.q_proj.bias": ("wq", "b"),
    "self_attn.k_proj.bias": ("wk", "b"),
    "self_attn.v_proj.bias": ("wv", "b"),
    "self_attn.q_norm.weight": ("q_norm", None),
    "self_attn.k_norm.weight": ("k_norm", None),
    "post_attention_layernorm.weight": ("ffn_norm", None),
    "mlp.gate_proj.weight": ("w_gate", "w"),
    "mlp.up_proj.weight": ("w_up", "w"),
    "mlp.down_proj.weight": ("w_down", "w"),
}

# GPTQ checkpoint tensor names (AutoGPTQ/vLLM convention): qweight int32
# (in/8, out), qzeros (in/g, out/8) int32, scales (in/g, out) fp16, g_idx.
_HF_LINEARS = {
    "self_attn.q_proj": "wq",
    "self_attn.k_proj": "wk",
    "self_attn.v_proj": "wv",
    "self_attn.o_proj": "wo",
    "mlp.gate_proj": "w_gate",
    "mlp.up_proj": "w_up",
    "mlp.down_proj": "w_down",
}
for _hf, _ours in _HF_LINEARS.items():
    for _leaf in ("qweight", "qzeros", "scales", "g_idx"):
        _SUB_MAP[f"{_hf}.{_leaf}"] = (_ours, _leaf)


def _split_fused(name: str, arr: np.ndarray, cfg: ModelConfig):
    """Split fused qkv_proj / gate_up_proj rows (llm.py:126-131)."""
    if "gate_up_proj" in name:
        half = arr.shape[0] // 2
        yield name.replace("gate_up_proj", "gate_proj"), arr[:half]
        yield name.replace("gate_up_proj", "up_proj"), arr[half:]
    elif "qkv_proj" in name:
        q = cfg.num_heads * cfg.head_dim
        kv = cfg.num_kv_heads * cfg.head_dim
        yield name.replace("qkv_proj", "q_proj"), arr[:q]
        yield name.replace("qkv_proj", "k_proj"), arr[q : q + kv]
        yield name.replace("qkv_proj", "v_proj"), arr[q + kv :]
    else:
        yield name, arr


def load_params(
    path_or_tensors,
    cfg: ModelConfig,
    shardings: Optional[dict] = None,
    device_put: Callable = jax.device_put,
) -> dict:
    """Assemble the stacked param pytree (models/llama.py docstring layout).

    ``path_or_tensors``: checkpoint dir, or an iterable of (name, ndarray)
    (used by tests to feed a transformers state_dict directly).
    """
    tensors = (
        iter_checkpoint_tensors(path_or_tensors)
        if isinstance(path_or_tensors, str)
        else path_or_tensors
    )

    L = cfg.num_layers
    dt = cfg.jnp_dtype
    staging: Dict[str, list] = {}

    def put_layer(sub: str, leaf: Optional[str], layer: int, arr: np.ndarray):
        key = f"{sub}.{leaf}" if leaf else sub
        staging.setdefault(key, [None] * L)[layer] = arr

    top: Dict[str, np.ndarray] = {}

    for raw_name, raw_arr in tensors:
        for name, arr in _split_fused(raw_name, raw_arr, cfg):
            if name == "model.embed_tokens.weight":
                top["embed"] = arr
                if cfg.tie_word_embeddings:
                    top["lm_head"] = arr.T
            elif name == "lm_head.weight":
                top["lm_head"] = arr.T
            elif name == "model.norm.weight":
                top["final_norm"] = arr
            else:
                m = _LAYER_RE.match(name)
                if not m:
                    continue  # rotary_emb.inv_freq etc. are recomputed natively
                layer, sub_name = int(m.group(1)), m.group(2)
                if sub_name not in _SUB_MAP:
                    continue
                sub, leaf = _SUB_MAP[sub_name]
                if leaf == "w":
                    arr = arr.T  # torch stores (out, in); we use (in, out)
                put_layer(sub, leaf, layer, arr)

    def stack(key):
        parts = staging[key]
        missing = [i for i, p in enumerate(parts) if p is None]
        if missing:
            raise ValueError(f"checkpoint missing layers {missing} for {key}")
        return np.stack(parts)

    def dev(arr, name=None, dtype=dt):
        x = jnp.asarray(np.asarray(arr), dtype)
        if shardings and name in shardings:
            return device_put(x, shardings[name])
        return device_put(x)

    # GPTQ repack pass: any sub with a qweight leaf becomes a {'q','s'} pack
    # in the TPU kernel layout (ops.quant module docstring).
    quant_subs = {k.split(".")[0] for k in staging if k.endswith(".qweight")}
    for sub in quant_subs:
        from ..ops.quant import repack_gptq

        qw = stack(f"{sub}.qweight")
        sc = stack(f"{sub}.scales")
        qz = staging.get(f"{sub}.qzeros")
        gi = staging.get(f"{sub}.g_idx")
        qs, ss = [], []
        for l in range(L):
            pack = repack_gptq(
                qw[l], sc[l],
                qzeros=None if qz is None else qz[l],
                g_idx=None if gi is None else gi[l],
            )
            qs.append(np.asarray(pack["q"]))
            ss.append(np.asarray(pack["s"]))
        for leaf in ("qweight", "scales", "qzeros", "g_idx"):
            staging.pop(f"{sub}.{leaf}", None)
        staging[f"{sub}.q"] = list(np.stack(qs))
        staging[f"{sub}.s"] = list(np.stack(ss))

    layers: Dict[str, object] = {}
    for key in staging:
        sub, _, leaf = key.partition(".")
        stacked = stack(key)
        if leaf in ("q",):
            layers.setdefault(sub, {})[leaf] = dev(stacked, key, jnp.int32)
        elif leaf in ("s",):
            from ..ops.quant import SCALE_DTYPE

            layers.setdefault(sub, {})[leaf] = dev(stacked, key, SCALE_DTYPE)
        elif leaf:
            layers.setdefault(sub, {})[leaf] = dev(stacked, key)
        else:
            layers[sub] = dev(stacked, key)

    if cfg.quant_lmhead:
        # quantize the (bf16) checkpoint lm_head at load time; N-padded for
        # the decode kernel's wide tiles (layers.modules.lm_head re-slices)
        from ..ops.quant import pack_weights_padded

        pk = pack_weights_padded(np.asarray(top["lm_head"], np.float32))
        from ..ops.quant import SCALE_DTYPE

        lm = {"q": dev(pk["q"], "lm_head.q", jnp.int32),
              "s": dev(pk["s"], "lm_head.s", SCALE_DTYPE)}
    else:
        lm = {"w": dev(top["lm_head"], "lm_head.w")}
    params = {
        "embed": dev(top["embed"], "embed"),
        "layers": layers,
        "final_norm": dev(top["final_norm"], "final_norm"),
        "lm_head": lm,
    }
    return params


# ---------------------------------------------------------------------------
# EAGLE drafter checkpoints
# ---------------------------------------------------------------------------


def load_eagle_params(
    path_or_tensors,
    base_cfg: ModelConfig,
    ecfg,
    base_params: Optional[dict] = None,
    token_id_remap=None,
):
    """Load an EAGLE-2 drafter checkpoint into the spec.eagle pytree.

    Name mangling mirrors cpmcu/speculative/eagle.py:149-163: the fused
    ``fc.weight`` (H_out, 2H_in) splits into fc1 (embedding half) and fc2
    (hidden half); ``fc.bias`` belongs to fc1; ``embed_tokens`` is dropped
    (the drafter shares the base embedding). With FR-Spec
    (``token_id_remap`` given), the draft lm_head is the base lm_head
    gathered at the frequency-ranked ids (remap_copy, minicpm4_eagle.cuh:222).
    """
    import numpy as np

    tensors = (
        iter_checkpoint_tensors(path_or_tensors)
        if isinstance(path_or_tensors, str)
        else path_or_tensors
    )
    m = ecfg.model
    dt = m.jnp_dtype
    L = m.num_layers
    H = m.hidden_size
    staging: Dict[str, list] = {}
    ep: Dict[str, object] = {}

    for name, arr in tensors:
        name = name.removeprefix("model.")
        if "embed_tokens" in name or "rotary_emb" in name:
            continue
        if name == "token_id_remap":
            token_id_remap = np.asarray(arr)
            continue
        if name == "fc.weight":
            ep["fc1_w"] = arr[:, :H].T
            ep["fc2_w"] = arr[:, H:].T
            continue
        if name == "fc.bias":
            ep["fc1_b"] = arr
            continue
        if name in ("input_norm1.weight", "input_norm2.weight"):
            ep[name.split(".")[0]] = arr
            continue
        if name == "rms_norm_rotation.weight":
            ep["rotation_w"] = arr.T  # hier rotation variant (EagleConfig)
            continue
        mm = re.match(r"layers\.(\d+)\.(.+)", name)
        if mm and mm.group(2) in _SUB_MAP:
            sub, leaf = _SUB_MAP[mm.group(2)]
            arr2 = arr.T if leaf == "w" else arr
            key = f"{sub}.{leaf}" if leaf else sub
            staging.setdefault(key, [None] * L)[int(mm.group(1))] = arr2

    layers: Dict[str, object] = {}
    for key, parts in staging.items():
        if any(p is None for p in parts):
            raise ValueError(f"eagle checkpoint missing layers for {key}")
        sub, _, leaf = key.partition(".")
        stacked = jnp.asarray(np.stack(parts), dt)
        if leaf:
            layers.setdefault(sub, {})[leaf] = stacked
        else:
            layers[sub] = stacked

    out = {
        "fc1": {"w": jnp.asarray(np.asarray(ep["fc1_w"]), dt)},
        "fc2": {"w": jnp.asarray(np.asarray(ep["fc2_w"]), dt)},
        "layers": layers,
    }
    if "fc1_b" in ep:
        out["fc1"]["b"] = jnp.asarray(np.asarray(ep["fc1_b"]), dt)
    if "input_norm1" in ep:
        out["input_norm1"] = jnp.asarray(np.asarray(ep["input_norm1"]), dt)
        out["input_norm2"] = jnp.asarray(np.asarray(ep["input_norm2"]), dt)
    if "rotation_w" in ep:
        out["rotation"] = {"w": jnp.asarray(np.asarray(ep["rotation_w"]), dt)}

    if token_id_remap is not None and ecfg.frspec_vocab_size:
        remap = jnp.asarray(
            np.asarray(token_id_remap)[: ecfg.frspec_vocab_size], jnp.int32
        )
        out["token_id_remap"] = remap
        if base_params is not None:
            out["lm_head"] = {"w": base_params["lm_head"]["w"][:, remap]}
    return out


def load_eagle3_params(path_or_tensors, base_cfg: ModelConfig, ecfg,
                       d2t_is_offset: bool = False):
    """Load an EAGLE-3 drafter checkpoint into the spec.eagle3 pytree.

    Name mangling mirrors Eagle3Impl::load_to_storage
    (reference src/model/eagle3/eagle3.cuh:330-378): ``midlayer.*`` maps to
    the single decoder layer (self_attn/mlp/input_layernorm/
    post_attention_layernorm/hidden_norm), ``fc.weight`` is the 3H->H
    feature fuser, ``norm.weight`` the output norm, ``d2t`` the
    draft->target vocab mapping (int64 in the checkpoint), ``lm_head`` the
    draft-vocab head. ``embed_tokens`` is dropped (base table reused,
    eagle3.cuh:92).
    """
    tensors = (
        iter_checkpoint_tensors(path_or_tensors)
        if isinstance(path_or_tensors, str)
        else path_or_tensors
    )
    m = ecfg.model
    dt = m.jnp_dtype
    out: Dict[str, object] = {}

    sub_map = {
        "self_attn.q_proj.weight": ("wq", "w"),
        "self_attn.k_proj.weight": ("wk", "w"),
        "self_attn.v_proj.weight": ("wv", "w"),
        "self_attn.o_proj.weight": ("wo", "w"),
        "input_layernorm.weight": ("input_norm", None),
        "hidden_norm.weight": ("hidden_norm", None),
        "post_attention_layernorm.weight": ("ffn_norm", None),
        "mlp.gate_proj.weight": ("w_gate", "w"),
        "mlp.up_proj.weight": ("w_up", "w"),
        "mlp.down_proj.weight": ("w_down", "w"),
    }

    for name, arr in tensors:
        name = name.removeprefix("model.")
        if "embed_tokens" in name or "rotary_emb" in name or name == "t2d":
            continue
        if name == "fc.weight":
            out["fc"] = {"w": jnp.asarray(np.asarray(arr).T, dt)}
        elif name == "norm.weight":
            out["output_norm"] = jnp.asarray(np.asarray(arr), dt)
        elif name == "lm_head.weight":
            out["lm_head"] = {"w": jnp.asarray(np.asarray(arr).T, dt)}
        elif name == "d2t":
            # the reference treats d2t as a direct map (target = d2t[draft],
            # tools_ealge3.cuh:45-60); pass d2t_is_offset=True for exporters
            # that store offsets (t = d + d2t[d], the yuhuili/EAGLE format)
            d2t = np.asarray(arr).astype(np.int64)
            if d2t_is_offset:
                d2t = np.arange(d2t.size, dtype=np.int64) + d2t
            out["d2t"] = jnp.asarray(d2t.astype(np.int32))
        else:
            mm = re.match(r"midlayer\.(.+)", name)
            if mm and mm.group(1) in sub_map:
                sub, leaf = sub_map[mm.group(1)]
                a = np.asarray(arr)
                if leaf == "w":
                    out[sub] = {"w": jnp.asarray(a.T, dt)}
                else:
                    out[sub] = jnp.asarray(a, dt)

    if "d2t" not in out and "lm_head" in out:
        vd = out["lm_head"]["w"].shape[1]
        out["d2t"] = jnp.arange(vd, dtype=jnp.int32)
    return out
