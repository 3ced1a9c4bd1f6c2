# T5-head generative VQA fine-tune (reference run_scripts/finetune_m3ae.sh)
python main_t5_m3ae.py with data_root=data/finetune_arrows/ \
    num_gpus=1 num_nodes=1 task_finetune_vqa_vqa_rad \
    per_gpu_batchsize=8 batch_size=64 clip16 text_roberta \
    image_size=384 tokenizer=roberta-base \
    t5_max_length=12 unfreeze_num_encoder_layers=4 unfreeze_num_decoder_layers=4 \
    learning_rate=1e-5 max_epoch=70 \
    load_path=checkpoints/m3ae.ckpt
