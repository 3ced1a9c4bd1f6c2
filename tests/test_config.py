"""Config system tests: base keys, named-config composition, CLI grammar
(parity with reference m3ae/config.py + run_scripts/*.sh)."""

from mm_vqa_healthcare_tpu import config as C


def test_base_config_reference_keys():
    cfg = C.base_config()
    # Every reference base-config key must exist with the reference default.
    assert cfg["batch_size"] == 4096
    assert cfg["vit"] == "ViT-B/32"
    assert cfg["loss_names"] == {"mlm": 1, "mim": 0, "itm": 1, "vqa": 0,
                                 "cls": 0, "irtr": 0}
    assert cfg["mim_prob"] == 0.75
    assert cfg["lr_multiplier_head"] == 5
    assert cfg["tokenizer"] == "bert-base-uncased"
    assert cfg["t5_model_name"] == "t5-small"
    assert cfg["melinda_label_size"]["i_meth"] == 85
    # The committed W&B API key must NOT be replicated.
    assert "api_key" not in cfg


def test_finetune_vqa_rad_named_config():
    cfg = C.compose(["task_finetune_vqa_vqa_rad"])
    assert cfg["datasets"] == ["vqa_vqa_rad"]
    assert cfg["loss_names"]["vqa"] == 1 and cfg["loss_names"]["mlm"] == 0
    assert cfg["batch_size"] == 64
    assert cfg["max_steps"] == 1000
    assert cfg["lr_multiplier_head"] == 100
    assert cfg["vqa_label_size"] == 498
    assert cfg["max_text_len"] == 32
    assert cfg["image_size"] == 576


def test_cli_grammar_matches_test_script():
    # reference run_scripts/test_m3ae.sh composition
    argv = ("with data_root=data/finetune_arrows_m3ae/ "
            "num_gpus=1 num_nodes=1 task_finetune_vqa_vqa_rad "
            "per_gpu_batchsize=16 clip16 text_roberta image_size=384 "
            "tokenizer=roberta-base test_only=True "
            "load_path=ckpt/m3ae.ckpt").split()
    cfg = C.parse_cli(argv)
    assert cfg["vit"] == "ViT-B/16" and cfg["patch_size"] == 16
    assert cfg["tokenizer"] == "roberta-base"
    assert cfg["vocab_size"] == 50265  # from text_roberta preset
    assert cfg["image_size"] == 384    # later override wins
    assert cfg["test_only"] is True
    assert cfg["per_gpu_batchsize"] == 16
    assert cfg["load_path"] == "ckpt/m3ae.ckpt"


def test_cli_value_parsing():
    cfg = C.parse_cli(["clip16", "learning_rate=5e-6", "max_epoch=7",
                       "exp_name=foo", "loss_names={'vqa': 1}"])
    assert cfg["learning_rate"] == 5e-6
    assert cfg["max_epoch"] == 7
    assert cfg["exp_name"] == "foo"
    assert cfg["loss_names"] == {"vqa": 1}


def test_unknown_key_rejected():
    import pytest
    with pytest.raises(KeyError):
        C.parse_cli(["not_a_key=3"])
    with pytest.raises(KeyError):
        C.parse_cli(["no_such_named_config"])


def test_run_scripts_cli_lines_compose():
    """Every run_scripts/*.sh CLI line parses through the sacred-compatible
    grammar (closes the run-scripts coverage partial): extract the
    `python main*.py with ...` invocation from each script, strip
    shell continuations, and compose it.  Guards against a script drifting
    from the config schema."""
    import glob
    import os
    import re
    import shlex

    scripts = sorted(glob.glob(os.path.join(
        os.path.dirname(__file__), "..", "run_scripts", "*.sh")))
    assert scripts
    checked = 0
    for path in scripts:
        text = open(path).read()
        # join continuation lines, then find python invocations
        text = text.replace("\\\n", " ")
        for line in text.splitlines():
            m = re.match(r"\s*python\s+(main\S*\.py)\s+(.*)", line)
            if not m:
                continue
            entry, rest = m.groups()
            assert os.path.exists(os.path.join(
                os.path.dirname(__file__), "..", entry)), entry
            # drop env-var style tokens and comments
            args = [a for a in shlex.split(rest.split("#")[0])
                    if not a.startswith("$")]
            cfg = C.parse_cli(args)
            assert cfg["num_gpus"] >= 1
            checked += 1
    assert checked >= 6  # pretrain, finetune x3, test x2
