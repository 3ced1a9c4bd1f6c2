#!/bin/bash
# EHR-XQA recipe end-to-end (VERDICT r3 item 7): synthetic raw fixture ->
# prepro CLI (reference prepro_finetuning_data.py:10-36 format) ->
# `main.py with task_finetune_vqa_ehr_xqa` test-only eval on the chip.
# The reference ships EHR-XQA as a TEST-ONLY dataset (testset.json only,
# reference config.py:151-175); its arrow writer emits no label2ans.json,
# so the eval reports vqa/score from answer_labels (text metrics need
# label2ans and are skipped — same as the reference generative path).
#
# Usage: bash run_scripts/e2e_ehr_xqa.sh
# Output: result/r4_ehr_xqa_e2e.log (+ metrics JSONL under result/).
set -e
cd "$(dirname "$0")/.."
WORK=${WORK:-/tmp/ehr_xqa_e2e}
rm -rf "$WORK" && mkdir -p "$WORK/raw" "$WORK/arrows"

python - "$WORK" <<'EOF'
import json, os, sys
import numpy as np
from PIL import Image
work = sys.argv[1]
sys.path.insert(0, "tests")
import fixtures
rng = np.random.default_rng(0)
rows = []
for i, (q, a, at) in enumerate(fixtures.QUESTIONS):
    name = f"xqa_{i % 4}.png"
    p = os.path.join(work, "raw", name)
    if not os.path.exists(p):
        Image.fromarray(rng.integers(0, 255, (48, 48, 3), np.uint8)).save(p)
    rows.append({"image_name": name, "qid": i, "question": q,
                 "answer": a, "answer_type": at})
with open(os.path.join(work, "raw", "testset.json"), "w") as f:
    json.dump(rows, f)
fixtures.write_vocab(os.path.join(work, "vocab.txt"))
EOF

python -m mm_vqa_healthcare_tpu.prepro.prepro_finetuning_data ehr_xqa \
    --data_root "$WORK/raw" --out "$WORK/arrows"

mkdir -p result
{
  python main.py with task_finetune_vqa_ehr_xqa tiny_debug \
    test_only=True data_root="$WORK/arrows" \
    tokenizer_path="$WORK/vocab.txt" vqa_label_size=8 \
    per_gpu_batchsize=4 batch_size=4 num_workers=0
  echo "e2e_ehr_xqa rc=$?"
} 2>&1 | tee result/r4_ehr_xqa_e2e.log
