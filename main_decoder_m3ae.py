"""Decoder-head generative VQA entry point (reference
main_decoder_m3ae.py:19-87).  Same CLI as the reference
(run_scripts/finetune_m3ae_decoder.sh / test_m3ae_decoder.sh)."""

import sys

from mm_vqa_healthcare_tpu.config import parse_cli
from mm_vqa_healthcare_tpu.train.decoder_trainer import DecoderTrainer
from mm_vqa_healthcare_tpu.utils.seed import seed_everything


def main(config):
    seed_everything(config["seed"])
    trainer = DecoderTrainer(config)
    if config["test_only"]:
        return trainer.test()
    return trainer.fit()


if __name__ == "__main__":
    main(parse_cli(sys.argv[1:]))
