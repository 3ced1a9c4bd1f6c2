# Pretraining (reference run_scripts/pretrain_m3ae.sh): MLM+MIM+ITM on
# ROCO+MedICaT.  num_gpus counts TPU chips in the data-parallel mesh.
python main.py with data_root=data/pretrain_arrows/ \
    num_gpus=8 num_nodes=1 task_pretrain_m3ae \
    per_gpu_batchsize=32 clip16 text_roberta \
    image_size=288 max_text_len=64 tokenizer=roberta-base
