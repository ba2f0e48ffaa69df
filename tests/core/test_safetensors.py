"""Safetensors reader/writer parity with the Rust implementation."""

import numpy as np
import pytest

from transformers_tpu.core.safetensors import SafetensorsFile, load_file, save_file


def test_roundtrip(tmp_path):
    import ml_dtypes

    path = str(tmp_path / "t.safetensors")
    tensors = {
        "a": np.arange(24, dtype=np.float32).reshape(2, 3, 4),
        "b": np.random.randn(5, 7).astype(np.float16),
        "c": (np.random.randn(3, 3) * 10).astype(ml_dtypes.bfloat16),
        "d": np.array([1, 2, 3], dtype=np.int64),
        "e": np.array(3.5, dtype=np.float32).reshape(()),
    }
    save_file(tensors, path, metadata={"format": "pt"})
    loaded = load_file(path)
    assert set(loaded) == set(tensors)
    for k in tensors:
        assert loaded[k].dtype == tensors[k].dtype
        np.testing.assert_array_equal(np.asarray(loaded[k], np.float32), np.asarray(tensors[k], np.float32))


def test_rust_safetensors_can_read_ours(tmp_path):
    st = pytest.importorskip("safetensors.numpy")
    path = str(tmp_path / "t.safetensors")
    tensors = {"x": np.random.randn(4, 4).astype(np.float32)}
    save_file(tensors, path)
    theirs = st.load_file(path)
    np.testing.assert_array_equal(theirs["x"], tensors["x"])


def test_we_can_read_rust_safetensors(tmp_path):
    st = pytest.importorskip("safetensors.numpy")
    path = str(tmp_path / "t.safetensors")
    tensors = {"x": np.random.randn(4, 4).astype(np.float32), "y": np.arange(3, dtype=np.int32)}
    st.save_file(tensors, path)
    ours = load_file(path)
    np.testing.assert_array_equal(ours["x"], tensors["x"])
    np.testing.assert_array_equal(ours["y"], tensors["y"])


def test_torch_bf16_interop(tmp_path):
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file as torch_save

    path = str(tmp_path / "bf16.safetensors")
    t = torch.randn(8, 8, dtype=torch.bfloat16)
    torch_save({"w": t}, path)
    ours = load_file(path)
    np.testing.assert_array_equal(
        np.asarray(ours["w"], np.float32), t.float().numpy()
    )


def test_row_slice(tmp_path):
    path = str(tmp_path / "t.safetensors")
    x = np.arange(40, dtype=np.float32).reshape(10, 4)
    save_file({"x": x}, path)
    with SafetensorsFile(path) as f:
        np.testing.assert_array_equal(f.get_slice_rows("x", 2, 5), x[2:5])
        assert f.get_shape("x") == (10, 4)
