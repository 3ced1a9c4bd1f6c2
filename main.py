"""Classifier-VQA entry point (reference main.py:17-82).

Same CLI:  python main.py with task_finetune_vqa_vqa_rad clip16 text_roberta \
               per_gpu_batchsize=16 image_size=384 test_only=True ...
so the reference run_scripts (finetune_m3ae*.sh / test_m3ae.sh) work
verbatim.  Builds the data module + M3AE + SPMD trainer, runs
fit -> test(best) or test-only.
"""

import sys

from mm_vqa_healthcare_tpu.config import parse_cli
from mm_vqa_healthcare_tpu.train.trainer import Trainer
from mm_vqa_healthcare_tpu.utils.seed import seed_everything


def main(config):
    seed_everything(config["seed"])
    trainer = Trainer(config)
    if config["test_only"]:
        trainer.setup_data()
        trainer.init_params()
        return trainer.test()
    return trainer.fit()


if __name__ == "__main__":
    main(parse_cli(sys.argv[1:]))
