"""TVP parity vs torch: frame-pad prompting, ResNet grid encoder, joint
prompt|text|visual BERT encoder, sigmoid grounding head."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def test_tvp_parity(tmp_path):
    from transformers_tpu.models.tvp import TvpForVideoGrounding

    torch.manual_seed(0)
    cfg = transformers.TvpConfig(
        backbone_config=dict(model_type="resnet", embedding_size=8,
                             hidden_sizes=[8, 16, 24, 32], depths=[1, 1, 1, 1],
                             out_features=["stage4"]),
        visual_prompt_size=8, max_img_size=64, num_frames=2, vocab_size=100,
        type_vocab_size=2,
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        max_grid_col_position_embeddings=16,
        max_grid_row_position_embeddings=16)
    tm = transformers.TvpForVideoGrounding(cfg).eval()
    d = str(tmp_path / "tvp")
    tm.save_pretrained(d, safe_serialization=True)

    m = TvpForVideoGrounding.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    rng = np.random.default_rng(0)
    px = rng.random((1, 2, 3, 64, 64)).astype(np.float32)
    ids = rng.integers(3, 99, size=(1, 6)).astype(np.int64)
    am = np.ones_like(ids)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(px),
                 attention_mask=torch.from_numpy(am)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids),
            pixel_values=jnp.asarray(px), attention_mask=jnp.asarray(am))
    assert max_abs_diff(out.logits, ref) < 1e-4
