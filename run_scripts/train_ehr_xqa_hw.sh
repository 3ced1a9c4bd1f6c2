#!/bin/bash
# EHR-XQA on-chip TRAINING (VERDICT r4 item 3): a short fine-tune through
# `main.py with task_finetune_vqa_ehr_xqa` on the real chip — loss descent
# in the train log + final test() score well above chance.  Round 4 only
# ever EVALUATED an untrained model on this path (r4_ehr_xqa_e2e.log);
# this exercises the second dataset's training config block end to end
# (reference config.py:151-175).  Fixture: single-image synthetic arrows
# (the question is the only predictive signal — tests/test_overfit.py
# module doc), written under the vqa_ehr_xqa dataset name.
#
# Usage: bash run_scripts/train_ehr_xqa_hw.sh
# Output: result/r5_ehr_xqa_train.log (expect vqa/score 1.0, rc=0)
set -e
cd "$(dirname "$0")/.."
WORK=${WORK:-/tmp/ehr_xqa_train}
rm -rf "$WORK" && mkdir -p "$WORK/arrows"

python - "$WORK" <<'EOF'
import os, sys
sys.path.insert(0, ".")
from tests import fixtures
from mm_vqa_healthcare_tpu.prepro.make_arrow import make_arrow_vqa_m3ae
work = sys.argv[1]
img = fixtures.make_images(os.path.join(work, "images"), n=1)[0]
data = {"train": [], "val": [], "test": []}
qid = 0
for split in ("train", "val", "test"):
    for _ in range(8):
        q, a, at = fixtures.QUESTIONS[qid % len(fixtures.QUESTIONS)]
        data[split].append({"img_path": img, "qid": qid, "question": q,
                            "answer": a, "answer_type": at})
        qid += 1
make_arrow_vqa_m3ae(data, "vqa_ehr_xqa", os.path.join(work, "arrows"),
                    label2ans_path=os.path.join(work, "arrows",
                                                "label2ans.json"))
fixtures.write_vocab(os.path.join(work, "vocab.txt"))
EOF

mkdir -p result
{
  python main.py with task_finetune_vqa_ehr_xqa tiny_debug \
    data_root="$WORK/arrows" tokenizer_path="$WORK/vocab.txt" \
    vqa_label_size=6 max_steps=200 max_epoch=10000 warmup_steps=0 \
    learning_rate=3e-4 lr_multiplier_head=100 lr_multiplier_multi_modal=5 \
    drop_rate=0.0 per_gpu_batchsize=4 batch_size=4 num_workers=0 \
    check_val_every_n_epoch=10 log_every_n_steps=10 \
    default_root_dir=/tmp/ehr_xqa_train_ckpt attention_impl=auto
  echo "train_ehr_xqa rc=$?"
} 2>&1 | tee result/r5_ehr_xqa_train.log
