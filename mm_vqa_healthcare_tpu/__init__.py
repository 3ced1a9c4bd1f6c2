"""TPU-native Medical VQA framework (capabilities of
better62/MM-VQA-Healthcare, re-designed for JAX/XLA/Pallas/pjit).

Public API (lazy to keep import cheap):
    config.compose / parse_cli        sacred-compatible config system
    models.M3AE / DecoderVQAModel / T5VQAModel
    train.Trainer / DecoderTrainer / T5Trainer
"""

__version__ = "0.1.0"


def __getattr__(name):
    import importlib
    lazy = {
        "M3AE": ("mm_vqa_healthcare_tpu.models.m3ae", "M3AE"),
        "M3AEConfig": ("mm_vqa_healthcare_tpu.models.m3ae", "M3AEConfig"),
        "DecoderVQAModel": ("mm_vqa_healthcare_tpu.models.decoder_model",
                            "DecoderVQAModel"),
        "T5VQAModel": ("mm_vqa_healthcare_tpu.models.t5_heads", "T5VQAModel"),
        "Trainer": ("mm_vqa_healthcare_tpu.train.trainer", "Trainer"),
        "DecoderTrainer": ("mm_vqa_healthcare_tpu.train.decoder_trainer",
                           "DecoderTrainer"),
        "T5Trainer": ("mm_vqa_healthcare_tpu.train.t5_trainer", "T5Trainer"),
    }
    if name in lazy:
        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)
