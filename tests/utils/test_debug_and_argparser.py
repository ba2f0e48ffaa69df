"""Debug utilities + HfArgumentParser + video sampling tests."""

import dataclasses
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import transformers_tpu as ttpu  # noqa: E402


def test_detect_overflow():
    tree = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, np.inf])}}
    bad = ttpu.detect_overflow(tree, "params")
    assert bad == ["params.b.c"]


def test_debug_underflow_overflow_catches_nan():
    config = ttpu.LlamaConfig(vocab_size=32, hidden_size=16, intermediate_size=32,
                              num_hidden_layers=1, num_attention_heads=2,
                              num_key_value_heads=2, max_position_embeddings=32)
    model = ttpu.LlamaForCausalLM(config)
    params = model.init_params(0)
    # poison one weight
    params["model"]["layers"]["0"]["mlp"]["gate_proj"]["weight"] = (
        params["model"]["layers"]["0"]["mlp"]["gate_proj"]["weight"].at[0, 0].set(jnp.nan))
    with pytest.raises(FloatingPointError):
        with ttpu.DebugUnderflowOverflow(model):
            model(params, input_ids=jnp.asarray([[1, 2, 3]]))


def test_model_addition_debugger(tmp_path):
    config = ttpu.LlamaConfig(vocab_size=32, hidden_size=16, intermediate_size=32,
                              num_hidden_layers=1, num_attention_heads=2,
                              num_key_value_heads=2, max_position_embeddings=32)
    model = ttpu.LlamaForCausalLM(config)
    params = model.init_params(0)
    path = str(tmp_path / "trace.json")
    with ttpu.model_addition_debugger_context(model, path) as records:
        model(params, input_ids=jnp.asarray([[1, 2, 3]]))
    assert any(r["module"] == "LlamaMLP" for r in records)
    import json

    saved = json.load(open(path))
    assert saved == records and len(saved) > 3


def test_hf_argparser():
    @dataclasses.dataclass
    class Args:
        lr: float = 1e-4
        steps: int = 10
        bf16: bool = False
        tags: list = dataclasses.field(default_factory=list)

    parser = ttpu.HfArgumentParser(Args)
    (args,) = parser.parse_args_into_dataclasses(
        ["--lr", "0.01", "--bf16", "--tags", "a", "b"])
    assert args.lr == 0.01 and args.bf16 is True and args.tags == ["a", "b"]
    (args2,) = parser.parse_dict({"steps": 7})
    assert args2.steps == 7 and args2.lr == 1e-4


def test_training_args_via_argparser():
    parser = ttpu.HfArgumentParser(ttpu.TrainingArguments)
    (args,) = parser.parse_args_into_dataclasses(
        ["--output_dir", "/tmp/x", "--learning_rate", "3e-4", "--max_steps", "5"],
    )
    assert args.learning_rate == 3e-4 and args.max_steps == 5


def test_video_frame_sampling():
    from transformers_tpu.video_utils import VideoMetadata, default_sample_indices_fn

    meta = VideoMetadata(total_num_frames=100, fps=25.0)
    idx = default_sample_indices_fn(meta, num_frames=10)
    assert len(idx) == 10 and idx[0] == 0 and idx[-1] == 90
    idx = default_sample_indices_fn(meta, fps=5)
    assert len(idx) == 20  # 4s video at 5 fps
    with pytest.raises(ValueError):
        default_sample_indices_fn(meta, num_frames=500)


def test_tensorboard_callback(tmp_path):
    from transformers_tpu.integrations import TensorBoardCallback, is_tensorboard_available

    if not is_tensorboard_available():
        pytest.skip("tensorboard not installed")
    args = ttpu.TrainingArguments(output_dir=str(tmp_path))
    cb = TensorBoardCallback()
    state = ttpu.TrainerState()
    control = ttpu.TrainerControl()
    cb.on_train_begin(args, state, control)
    cb.on_log(args, state, control, logs={"loss": 1.0})
    cb.on_train_end(args, state, control)
    assert any((Path(tmp_path) / "runs").iterdir())


def test_video_processor_roundtrip(tmp_path):
    from transformers_tpu import AutoVideoProcessor, BaseVideoProcessor

    proc = BaseVideoProcessor(size={"height": 16, "width": 16}, do_sample_frames=True,
                              num_frames=4)
    d = str(tmp_path)
    proc.save_pretrained(d)
    loaded = AutoVideoProcessor.from_pretrained(d)
    assert loaded.num_frames == 4
    video = np.random.default_rng(0).integers(0, 255, size=(10, 24, 24, 3), dtype=np.uint8)
    out = loaded([video], return_tensors="np")
    assert out["pixel_values_videos"].shape == (1, 4, 3, 16, 16)


def test_capture_attentions():
    config = ttpu.LlamaConfig(vocab_size=32, hidden_size=16, intermediate_size=32,
                              num_hidden_layers=2, num_attention_heads=2,
                              num_key_value_heads=2, max_position_embeddings=32,
                              attn_implementation="eager")
    model = ttpu.LlamaForCausalLM(config)
    params = model.init_params(0)
    from transformers_tpu.debug_utils import capture_attentions

    with capture_attentions() as records:
        model(params, input_ids=jnp.asarray([[1, 2, 3, 4]]))
    assert len(records) == 2  # one per layer
    probs = records[0]
    assert probs.shape == (1, 2, 4, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    # causal: upper triangle is zero
    assert probs[0, 0, 0, 1] < 1e-6
