# Classifier eval on VQA-RAD test split (reference run_scripts/test_m3ae.sh)
python main.py with data_root=data/finetune_arrows_m3ae/ \
    num_gpus=1 num_nodes=1 task_finetune_vqa_vqa_rad \
    per_gpu_batchsize=16 clip16 text_roberta image_size=384 \
    tokenizer=roberta-base test_only=True \
    load_path=checkpoints/m3ae_finetuned_vqa_vqa_rad_77.4.ckpt
