"""T5-head generative VQA entry point (reference main_t5_m3ae.py:19-98).

Same CLI as the reference (run_scripts/finetune_m3ae.sh).  The reference's
`unfreeze_top_layers(num_encoder_layers, num_decoder_layers)` before fit
(main_t5_m3ae.py:29-30) is realized as the trainer's frozen/trainable
optimizer partition.
"""

import sys

from mm_vqa_healthcare_tpu.config import parse_cli
from mm_vqa_healthcare_tpu.train.t5_trainer import T5Trainer
from mm_vqa_healthcare_tpu.utils.seed import seed_everything


def main(config, variant: str = "mm"):
    seed_everything(config["seed"])
    trainer = T5Trainer(config, variant=variant)
    if config["test_only"]:
        return trainer.test()
    return trainer.fit()


if __name__ == "__main__":
    main(parse_cli(sys.argv[1:]))
