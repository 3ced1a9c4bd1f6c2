"""Checkpoint interop CLI: reference PL .ckpt <-> native msgpack.

  # reference torch -> native
  python -m mm_vqa_healthcare_tpu.cli.convert_ckpt import \
      --ckpt m3ae.ckpt --out m3ae.msgpack -- with task_finetune_vqa_vqa_rad \
      clip16 text_roberta image_size=384 tokenizer=roberta-base

  # native -> reference torch (runs in the reference stack unchanged)
  python -m mm_vqa_healthcare_tpu.cli.convert_ckpt export \
      --ckpt m3ae.msgpack --out m3ae_export.ckpt -- with ...
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

from mm_vqa_healthcare_tpu.checkpoint import convert, io
from mm_vqa_healthcare_tpu.config import parse_cli
from mm_vqa_healthcare_tpu.models.m3ae import M3AE, M3AEConfig


def _init(config):
    model_cfg = M3AEConfig.from_dict(config)
    model = M3AE(model_cfg)
    batch = {
        "text_ids": jnp.ones((1, config["max_text_len"]), jnp.int32),
        "text_masks": jnp.ones((1, config["max_text_len"]), jnp.int32),
        "image": jnp.zeros((1, config["image_size"], config["image_size"], 3),
                           jnp.float32),
    }
    params = model.init({"params": jax.random.key(0),
                         "mim": jax.random.key(1)}, batch)
    return model_cfg, params


def main():
    if "--" in sys.argv:
        at = sys.argv.index("--")
        rest, cfg_args = sys.argv[1:at], sys.argv[at + 1:]
    else:
        rest, cfg_args = sys.argv[1:], []
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=["import", "export"])
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args(rest)
    config = parse_cli(cfg_args)
    model_cfg, params = _init(config)

    if args.mode == "import":
        params, loaded, missing = convert.load_reference_checkpoint(
            args.ckpt, model_cfg, params)
        io.save_native(args.out, params, config)
        print(f"imported {len(loaded)} tensors -> {args.out} "
              f"({len(missing)} keys left at init)")
    else:
        params = io.load_native(args.ckpt, params)
        io.export_torch_ckpt(args.out, params, model_cfg, config)
        print(f"exported reference-format checkpoint -> {args.out}")


if __name__ == "__main__":
    main()
