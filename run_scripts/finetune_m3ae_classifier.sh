# Classifier-head VQA fine-tune (reference main.py path)
python main.py with data_root=data/finetune_arrows_m3ae/ \
    num_gpus=1 num_nodes=1 task_finetune_vqa_vqa_rad \
    per_gpu_batchsize=16 batch_size=64 clip16 text_roberta \
    image_size=384 tokenizer=roberta-base \
    learning_rate=1e-5 \
    load_path=checkpoints/m3ae.ckpt
