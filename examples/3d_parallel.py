"""3D-parallel training on one mesh (the analog of reference
examples/3D_parallel.py — DeviceMesh ["dp","tp","cp"] + FSDP + DCP there;
here ONE jax.sharding.Mesh and PartitionSpec algebra do all of it).

Run on 8 virtual CPU devices:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/3d_parallel.py
"""

import numpy as np

import transformers_tpu as ttpu
from transformers_tpu.trainer import Trainer
from transformers_tpu.training_args import ParallelismConfig, TrainingArguments


def main():
    config = ttpu.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, max_position_embeddings=128)
    model = ttpu.LlamaForCausalLM(config)

    rng = np.random.default_rng(0)
    data = [{"input_ids": row, "labels": row.copy()}
            for row in rng.integers(1, 256, size=(64, 32))]

    args = TrainingArguments(
        output_dir="/tmp/ttpu_3d_parallel",
        per_device_train_batch_size=1,
        max_steps=5,
        learning_rate=1e-3,
        logging_steps=1,
        save_strategy="no",
        # dp=2 x fsdp=2 x tp=2 over 8 devices — weights shard by the model's
        # _tp_plan on the tensor axis and ZeRO-style on the fsdp axis; the
        # batch shards over (data, fsdp).
        parallelism_config=ParallelismConfig(dp_size=2, fsdp_size=2, tp_size=2),
    )
    trainer = Trainer(model, args, train_dataset=data)
    trainer.train()
    print("mesh:", dict(zip(trainer.mesh.axis_names, trainer.mesh.devices.shape)))
    print("losses:", [l["loss"] for l in trainer.state.log_history if "loss" in l])


if __name__ == "__main__":
    main()
