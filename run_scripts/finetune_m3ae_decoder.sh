# Decoder-head generative VQA fine-tune (reference finetune_m3ae_decoder.sh)
python main_decoder_m3ae.py with data_root=data/finetune_arrows_m3ae/ \
    num_gpus=1 num_nodes=1 task_finetune_vqa_vqa_rad \
    per_gpu_batchsize=32 batch_size=64 clip16 text_roberta \
    image_size=384 tokenizer=roberta-base \
    mm_encoder_inputs_include_cls_feats=True mm_encoder_inputs_include_imagetext_feats=True \
    learning_rate=1e-4 max_epoch=15 \
    load_path=checkpoints/m3ae.ckpt
