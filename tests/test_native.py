"""Native C++ loader library: safetensors mmap reader, GPTQ repack, tracer."""

import os

import numpy as np
import pytest

from cpmcu_tpu.io import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("g++ / native build unavailable")
    return lib


def test_native_safetensors_roundtrip(tmp_path, lib):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    tensors = {
        "a": rng.normal(size=(16, 32)).astype(np.float32),
        "b": np.arange(100, dtype=np.int32),
        "nested.name.weight": rng.normal(size=(4, 4, 4)).astype(np.float16),
    }
    path = str(tmp_path / "t.safetensors")
    save_file(tensors, path, metadata={"format": "pt"})

    with native.NativeSafetensors(path) as f:
        assert sorted(f.keys()) == sorted(tensors.keys())
        for name, want in tensors.items():
            got = f.get(name)
            assert got.shape == want.shape and got.dtype == want.dtype
            np.testing.assert_array_equal(got, want)


def test_native_bf16(tmp_path, lib):
    import ml_dtypes
    from safetensors.numpy import save_file

    a32 = np.random.default_rng(1).normal(size=(8, 128)).astype(np.float32)
    a = a32.astype(ml_dtypes.bfloat16)
    # safetensors numpy API can't write bf16 directly; write via raw view
    import torch
    from safetensors.torch import save_file as save_torch

    t = torch.from_numpy(a.view(np.uint16).copy()).view(torch.bfloat16)
    path = str(tmp_path / "bf16.safetensors")
    save_torch({"w": t}, path)

    with native.NativeSafetensors(path) as f:
        got = f.get("w")
        assert got.dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(got.view(np.uint16), a.view(np.uint16))


def test_native_gptq_repack_matches_numpy(lib):
    from cpmcu_tpu.ops.quant import pack_rows, unpack_rows

    rng = np.random.default_rng(2)
    K, N = 2048, 64
    q4 = rng.integers(0, 16, size=(K, N)).astype(np.int32)

    # build the GPTQ layout: nibble j of word k8 = row k8*8+j
    gptq = np.zeros((K // 8, N), np.uint32)
    for j in range(8):
        gptq |= q4[j::8].astype(np.uint32) << (4 * j)
    gptq = gptq.astype(np.int32)

    got = native.repack_gptq_native(gptq)
    want = pack_rows(q4)
    np.testing.assert_array_equal(got, want)
    # and the full unpack roundtrip
    np.testing.assert_array_equal(unpack_rows(got), q4)


def test_loader_uses_native_reader(tmp_path, lib):
    """iter_checkpoint_tensors must produce identical tensors through the
    native path as the safetensors library."""
    from safetensors.numpy import save_file

    from cpmcu_tpu.io.hf_loader import iter_checkpoint_tensors

    rng = np.random.default_rng(3)
    tensors = {"x": rng.normal(size=(8, 8)).astype(np.float32)}
    save_file(tensors, str(tmp_path / "m.safetensors"))
    out = dict(iter_checkpoint_tensors(str(tmp_path)))
    np.testing.assert_array_equal(out["x"], tensors["x"])


def test_crash_tracer_installs(lib):
    assert native.install_crash_tracer()
