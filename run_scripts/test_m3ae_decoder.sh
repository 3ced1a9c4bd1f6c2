# Decoder-head greedy-decode eval (reference run_scripts/test_m3ae_decoder.sh)
python main_decoder_m3ae.py with data_root=data/finetune_arrows_m3ae/ \
    num_gpus=1 num_nodes=1 task_finetune_vqa_vqa_rad \
    per_gpu_batchsize=32 clip16 text_roberta image_size=384 \
    tokenizer=roberta-base test_only=True \
    load_path=checkpoints/m3ae.ckpt decoder_load_path=checkpoints/decoder.ckpt
