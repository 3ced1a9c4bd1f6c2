"""Convergence proof for all four training lanes (VERDICT r3 item 1).

Every other trainer test runs <=2 steps and asserts finiteness; these
overfit a tiny fixture for a few hundred steps and assert the score is
near-perfect.  This is the only checkpoint-free end-to-end evidence that
objectives, LR groups, schedules, freezing, and grad accumulation are all
wired so the stack actually LEARNS (a target-alignment bug, an LR-group
mislabel, or a masking sign error would pass every finiteness test and
fail here).

The fixture's answers are a pure function of the question text and ALL
samples share ONE image: the stock fixture's random-noise images are so
distinctive that the model memorizes the image->answer shortcut instead
of reading the question (observed: train score 4/4, test score 0 because
test pairs the same questions with different images).  With a single
shared image the question is the only predictive signal, so a near-1.0
test score proves the text path + objective + optimizer all learn.
Reference training semantics:
/root/reference/m3ae/modules/m3ae_utils.py:112-242, objectives.py:14-234.

Convergence tier (round 5): these calibrated lanes cost ~55 min together
— wrapper-timeout scale — so they run behind `-m convergence` (or
MMVQA_CONVERGENCE=1), once per round as the round-end gate.  The default
tier keeps reduced-step learning coverage in tests/test_learning_smoke.py.
"""

import os

import numpy as np
import pytest

from tests import fixtures

pytestmark = pytest.mark.convergence


def _make_single_image_vqa(root: str):
    """VQA arrows where every sample uses the same image (see module doc).

    val/test carry ALL 8 questions (not a 4-question slice): best-ckpt
    selection monitors the val score, and a partial val set freezes
    "best" the first time ITS questions are memorized while the others
    are still wrong — the round-4 hardware run hit exactly that (val 1.0
    at step 108, test 0.5 with the step-108 weights)."""
    from mm_vqa_healthcare_tpu.prepro.make_arrow import make_arrow_vqa_m3ae
    img = fixtures.make_images(os.path.join(root, "images"), n=1)[0]
    data = {"train": [], "val": [], "test": []}
    qid = 0
    for split, count in [("train", 8), ("val", 8), ("test", 8)]:
        for _ in range(count):
            q, a, at = fixtures.QUESTIONS[qid % len(fixtures.QUESTIONS)]
            data[split].append({"img_path": img, "qid": qid, "question": q,
                                "answer": a, "answer_type": at})
            qid += 1
    data_root = os.path.join(root, "arrows")
    label2ans = os.path.join(data_root, "label2ans.json")
    os.makedirs(data_root, exist_ok=True)
    make_arrow_vqa_m3ae(data, "vqa_vqa_rad", data_root,
                        label2ans_path=label2ans)
    vocab = fixtures.write_vocab(os.path.join(root, "vocab.txt"))
    return data_root, label2ans, vocab


@pytest.fixture(scope="module")
def vqa_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("overfit_fixture")
    return _make_single_image_vqa(str(root))


def _overfit_overrides(tmp_path, steps):
    # aggressive-but-stable LR for from-scratch tiny towers: base 3e-4,
    # heads x10; linear decay to 0 over the run anneals the endpoint
    return dict(
        max_steps=steps, max_epoch=10_000, warmup_steps=0,
        learning_rate=3e-4, lr_multiplier_head=10,
        lr_multiplier_multi_modal=5,
        default_root_dir=str(tmp_path), log_every_n_steps=10_000,
        drop_rate=0.0,
    )


def test_overfit_classifier(vqa_data, tmp_path):
    from mm_vqa_healthcare_tpu.train.trainer import Trainer
    data_root, _, vocab = vqa_data
    cfg = fixtures.tiny_config(data_root, vocab,
                               **_overfit_overrides(tmp_path, 200))
    metrics = Trainer(cfg).fit()
    assert metrics["vqa/score"] >= 0.95, metrics


def test_overfit_ehr_xqa(tmp_path_factory, tmp_path):
    """Classifier convergence on the SECOND dataset name (vqa_ehr_xqa):
    its own config block (reference config.py:151-175: lr_multiplier_head
    100, its own label space), registry entry, and arrow naming.  The
    reference ships EHR-XQA test-only, but the finetune recipe must train
    when train/val arrows exist; round 4 only ever EVALUATED an untrained
    model on this path."""
    from mm_vqa_healthcare_tpu.prepro.make_arrow import make_arrow_vqa_m3ae
    from mm_vqa_healthcare_tpu.train.trainer import Trainer
    root = str(tmp_path_factory.mktemp("overfit_ehr"))
    img = fixtures.make_images(os.path.join(root, "images"), n=1)[0]
    data = {"train": [], "val": [], "test": []}
    qid = 0
    for split in ("train", "val", "test"):
        for _ in range(8):
            q, a, at = fixtures.QUESTIONS[qid % len(fixtures.QUESTIONS)]
            data[split].append({"img_path": img, "qid": qid, "question": q,
                                "answer": a, "answer_type": at})
            qid += 1
    data_root = os.path.join(root, "arrows")
    os.makedirs(data_root)
    make_arrow_vqa_m3ae(data, "vqa_ehr_xqa", data_root,
                        label2ans_path=os.path.join(data_root,
                                                    "label2ans.json"))
    vocab = fixtures.write_vocab(os.path.join(root, "vocab.txt"))
    cfg = fixtures.tiny_config(data_root, vocab,
                               task="task_finetune_vqa_ehr_xqa",
                               **_overfit_overrides(tmp_path, 300))
    # _overfit_overrides' calibrated head x10 replaces the recipe's x100:
    # at tiny scale the x100 head (LR 3e-2) oscillates — 0.875 at 200
    # steps — while the lane's subject is the ehr_xqa DATASET PATH, not
    # its production LR (the recipe's own multiplier is exercised on
    # hardware in result/r5_ehr_xqa_train.log, score 0.75 with the x100).
    metrics = Trainer(cfg).fit()
    assert metrics["vqa/score"] >= 0.95, metrics


def test_overfit_decoder(vqa_data, tmp_path):
    """The decoder trains against a FROZEN backbone (reference
    m3ae_decoder.py:213-216); with a from-scratch random backbone the
    2-token CLS memory is nearly question-invariant at tiny scale, so the
    overfit uses the reference's include_imagetext_feats flag (richer
    memory, m3ae_decoder.py:302-313) and a hotter LR.  Calibrated: TF
    accuracy saturates ~step 500, greedy exact_match 1.0 at 600 — but
    600 sits on a knife edge: the same commit measured 8/8 in the r4
    full-suite run and 7/8 standalone in round 5 (last-sample flips at
    the 1e-7 level move one greedy argmax; XLA:CPU reduction order is
    load-sensitive).  1000 steps at the same LR gives the margin the
    lane needs (a cooler 1.5e-3 under-fits the 3-token open answer —
    the multi-token sample is the binding constraint)."""
    from mm_vqa_healthcare_tpu.train.decoder_trainer import DecoderTrainer
    data_root, _, vocab = vqa_data
    # the decoder/T5 fit loops pace by EPOCHS (2 steps each at this
    # fixture/batch size); max_steps only sizes the LR schedule, so it
    # must span the whole run — max_steps=2 silently decays LR to 0
    # after 2 steps and the model never trains (the round-4 failure mode)
    cfg = fixtures.tiny_config(data_root, vocab,
                               mm_encoder_inputs_include_imagetext_feats=True,
                               **_overfit_overrides(tmp_path, 1000))
    cfg["max_epoch"] = 500          # decoder fit paces by epochs (2 steps ea)
    cfg["learning_rate"] = 2e-3
    t = DecoderTrainer(cfg)
    t.max_answer_length = 8
    metrics = t.fit()
    assert metrics["test/exact_match"] >= 0.95, metrics


def _make_identical_splits_vqa(root: str):
    """VQA arrows with DISTINCT images where val/test repeat the train
    pairs (byte-identical image copies under split-suffixed paths).

    The T5 mm-variant's encoder prompt is built ONLY from frozen-backbone
    features, so with the single-shared-image fixture the question signal
    survives only as the pooled fusion CLS of a RANDOM backbone —
    measured ~0.3% relative variation across samples, which a tiny
    from-scratch T5 cannot amplify (round-4 diagnosis,
    run_scripts/debug_t5_overfit.py: position-1 logits stayed
    sample-invariant after 600 steps).  Distinct images make the
    projected image features carry the pairing; test==train pairs make
    memorization the measured quantity."""
    import shutil
    from mm_vqa_healthcare_tpu.prepro.make_arrow import make_arrow_vqa_m3ae
    imgs = fixtures.make_images(os.path.join(root, "images"), n=8)
    data = {"train": [], "val": [], "test": []}
    for split in ("train", "val", "test"):
        n = 8 if split == "train" else 4
        for i in range(n):
            q, a, at = fixtures.QUESTIONS[i % len(fixtures.QUESTIONS)]
            p = imgs[i]
            if split != "train":
                p2 = p.replace(".png", f"_{split}.png")
                shutil.copyfile(p, p2)
                p = p2
            data[split].append({"img_path": p, "qid": 100 * i + ord(split[0]),
                                "question": q, "answer": a,
                                "answer_type": at})
    data_root = os.path.join(root, "arrows")
    os.makedirs(data_root, exist_ok=True)
    make_arrow_vqa_m3ae(data, "vqa_vqa_rad", data_root,
                        label2ans_path=os.path.join(data_root,
                                                    "label2ans.json"))
    vocab = fixtures.write_vocab(os.path.join(root, "vocab.txt"))
    return data_root, vocab


def test_overfit_t5(tmp_path_factory, tmp_path):
    import mm_vqa_healthcare_tpu.models.t5 as t5_mod
    from mm_vqa_healthcare_tpu.data.tokenization import load_tokenizer
    from mm_vqa_healthcare_tpu.models.t5 import T5Config
    from mm_vqa_healthcare_tpu.train.t5_trainer import T5Trainer
    root = tmp_path_factory.mktemp("overfit_t5")
    data_root, vocab = _make_identical_splits_vqa(str(root))
    # Calibrated via run_scripts/debug_t5_overfit.py: TF loss 4.18 → 0.7
    # by step 300 at LR 3e-3, position-1 (the only encoder-dependent
    # token) 3/4 correct at 400, saturating by ~600.  unfreeze 2+2 = the
    # whole tiny T5 (reference unfreezes 4 of t5-small's 6 — the
    # majority; the threshold arithmetic is still exercised and the M3AE
    # backbone stays frozen).  The short t5_encoder_max_seq_len avoids
    # the reference's 509 unmasked zero-embedding positions drowning the
    # 19 informative prompt tokens at tiny scale.
    cfg = fixtures.tiny_config(data_root, vocab, t5_max_length=8,
                               unfreeze_num_encoder_layers=2,
                               unfreeze_num_decoder_layers=2,
                               t5_generation=False,
                               **_overfit_overrides(tmp_path, 600))
    cfg["max_epoch"] = 300          # paces by epochs; steps sizes the LR decay
    cfg["learning_rate"] = 3e-3
    cfg["t5_encoder_max_seq_len"] = 24
    cfg["mm_encoder_inputs_include_imagetext_feats"] = True
    cfg["mm_encoder_inputs_mm_feats_width"] = 16
    # bug_compat=True replays the reference's fresh-random-projection
    # quirk (m3ae_t5_mm_encoder_input.py:75-77): the T5 encoder inputs are
    # re-projected through a NEW random linear every forward.  The
    # reference still trains because its pretrained T5 carries the
    # mapping; with this test's from-scratch tiny T5 the re-randomized
    # inputs are unlearnable by construction, so the convergence proof
    # runs the repaired path (stable projections + the trained
    # feature_projection — the quirk itself is covered by
    # tests/test_t5_head.py parity tests)
    cfg["bug_compat"] = False
    t5_mod.T5_PRESETS["t5-small"] = T5Config(
        vocab_size=200, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2)
    tok = load_tokenizer("tiny-bert", vocab)
    t = T5Trainer(cfg, variant="mm", tokenizer=tok)
    metrics = t.fit()
    assert metrics["test/exact_match"] >= 0.95, metrics


def test_overfit_t5_combined(tmp_path_factory, tmp_path, monkeypatch):
    """Combined-variant convergence (reference
    m3ae_t5_combined_encoder_input.py:96-195): the T5-tokenized question
    rides IN the encoder prompt, so with the single-image fixture the
    question ids are the only predictive signal — exact_match 1.0 proves
    the combined prompt assembly (context prefix ++ 3 pooled projections
    ++ question prefix ++ question ids) feeds a learnable encoder input.
    Round 4 had only 2-step parity coverage for this variant."""
    import mm_vqa_healthcare_tpu.models.t5 as t5_mod
    from mm_vqa_healthcare_tpu.data.tokenization import load_tokenizer
    from mm_vqa_healthcare_tpu.models.t5 import T5Config
    from mm_vqa_healthcare_tpu.train.t5_trainer import T5Trainer
    root = tmp_path_factory.mktemp("overfit_t5_comb")
    data_root, _, vocab = _make_single_image_vqa(str(root))
    cfg = fixtures.tiny_config(data_root, vocab, t5_max_length=8,
                               unfreeze_num_encoder_layers=2,
                               unfreeze_num_decoder_layers=2,
                               t5_generation=False,
                               **_overfit_overrides(tmp_path, 1200))
    cfg["max_epoch"] = 600          # paces by epochs; steps sizes LR decay
    # Calibrated: 3e-3 oscillates on one open-ended sample (7/8 at 600
    # AND 1200 steps — same wrong sample, an LR limit not a step count);
    # 1.5e-3 reaches 8/8 by 1200 steps (~2 min lane).
    cfg["learning_rate"] = 1.5e-3
    # room for context prefix + 3 pooled slots + question prefix + 16
    # question ids; the reference's full 512-position padding regime is
    # covered by test_overfit_t5_512_prompt
    cfg["t5_encoder_max_seq_len"] = 48
    cfg["bug_compat"] = False
    monkeypatch.setitem(t5_mod.T5_PRESETS, "t5-small", T5Config(
        vocab_size=200, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2))
    tok = load_tokenizer("tiny-bert", vocab)
    t = T5Trainer(cfg, variant="combined", tokenizer=tok)
    metrics = t.fit()
    assert metrics["test/exact_match"] >= 0.95, metrics


def test_overfit_t5_512_prompt(tmp_path_factory, tmp_path, monkeypatch):
    """T5 learning at the REFERENCE prompt regime: soft prompt padded to
    512 UNMASKED positions (m3ae_t5_mm_encoder_input.py:160-190 — ~490
    zero-embedding attended positions dilute the ~20 informative tokens).
    The calibrated mm-variant lane deliberately scales that down
    (t5_encoder_max_seq_len=24); this lane keeps the 512 padding and
    asserts the training signal survives it: teacher-forced loss halves
    AND first-answer-token TF accuracy on the memorized train pairs is
    high (the first label token is the encoder-dependent one — see
    NOTES_ROUND4).  Full greedy exact-match at tiny scale under 512-way
    dilution is not required — loss descent + TF pairing accuracy is the
    VERDICT r4 item-4 bar."""
    import jax
    import jax.numpy as jnp
    import mm_vqa_healthcare_tpu.models.t5 as t5_mod
    from mm_vqa_healthcare_tpu.data.tokenization import load_tokenizer
    from mm_vqa_healthcare_tpu.models.t5 import T5Config
    from mm_vqa_healthcare_tpu.train.t5_trainer import T5Trainer
    from mm_vqa_healthcare_tpu.train.trainer import prepare_image_batch
    root = tmp_path_factory.mktemp("overfit_t5_512")
    data_root, vocab = _make_identical_splits_vqa(str(root))
    steps = 600
    cfg = fixtures.tiny_config(data_root, vocab, t5_max_length=8,
                               unfreeze_num_encoder_layers=2,
                               unfreeze_num_decoder_layers=2,
                               t5_generation=False,
                               **_overfit_overrides(tmp_path, steps))
    cfg["max_epoch"] = 10_000
    cfg["learning_rate"] = 3e-3
    cfg["t5_encoder_max_seq_len"] = 512     # the reference default, kept
    cfg["mm_encoder_inputs_include_imagetext_feats"] = True
    cfg["mm_encoder_inputs_mm_feats_width"] = 16
    cfg["bug_compat"] = False
    # wider tiny T5 than the short-prompt lane: at 512 attended positions
    # the informative tokens carry ~4% of attention mass at init, so the
    # model needs a little more capacity to pull them out
    monkeypatch.setitem(t5_mod.T5_PRESETS, "t5-small", T5Config(
        vocab_size=200, d_model=48, d_kv=12, num_heads=4, d_ff=96,
        num_layers=2, num_decoder_layers=2))
    tok = load_tokenizer("tiny-bert", vocab)
    t = T5Trainer(cfg, variant="mm", tokenizer=tok)
    dm = t.setup_data()
    t.init_params()
    t.setup_optimizer(max(1, len(dm.dataset("train")) // dm.batch_size))
    train_step = t._get_jitted("train")
    losses, step = [], 0
    cached = []
    while step < steps:
        for batch in dm.train_loader(step):
            dev = t._device_batch(batch, with_labels=True)
            if len(cached) < 2:
                cached.append(dev)
            rng = jax.random.fold_in(t.rng, step)
            t.params, t.opt_state, loss = train_step(
                t.params, t.opt_state, dev, rng)
            losses.append(float(jax.device_get(loss)))
            step += 1
            if step >= steps:
                break
    head = float(np.mean(losses[:5]))
    tail = float(np.mean(losses[-5:]))
    assert tail < 0.5 * head, f"TF loss did not halve: {head} -> {tail}"
    # first-answer-token TF accuracy on the memorized train batches
    correct, total = 0, 0
    for dev in cached:
        b2 = prepare_image_batch(dict(dev), t.image_mean, t.image_std,
                                 cfg["image_size"])
        logits = t.model.apply(t.params, b2, b2["t5_labels"],
                               rng=jax.random.key(0), deterministic=True)
        pred = np.asarray(jnp.argmax(logits, -1))
        gold = np.asarray(dev["t5_labels"])
        correct += int((pred[:, 0] == gold[:, 0]).sum())
        total += pred.shape[0]
    assert correct / total >= 0.75, \
        f"first-token TF accuracy {correct}/{total} under 512-way padding"


def _make_overfit_caption_fixture(root: str, name: str = "roco") -> str:
    """Caption arrows where val/test repeat the TRAIN pairs verbatim.

    The stock caption fixture gives val/test UNSEEN (image, caption)
    pairs — correct for pipeline tests, but an overfit proof measures
    memorization: itm/mim on never-seen images can only score chance no
    matter how well the stack learns (the round-4 failure mode).
    make_arrow keys rows by img_path (one split per image, reference
    semantics), so val/test carry byte-identical COPIES of the train
    images under distinct paths."""
    import shutil
    from mm_vqa_healthcare_tpu.prepro.make_arrow import make_arrow
    img_paths = fixtures.make_images(os.path.join(root, "cap_images"), n=6)
    captions = ["chest radiograph showing opacity",
                "xray of the lung with mass",
                "normal chest radiograph",
                "heart enlarged in patient",
                "ct scan of the abdomen",
                "mri of the brain with lesion"]

    def pairs_for(split, count):
        out = []
        for i in range(count):
            p = img_paths[i]
            if split != "train":
                p = p.replace(".png", f"_{split}.png")
                shutil.copyfile(img_paths[i], p)
            out.append({"img_path": p, "texts": [captions[i]]})
        return out

    data = {"train": pairs_for("train", 6), "val": pairs_for("val", 6),
            "test": pairs_for("test", 6)}
    data_root = os.path.join(root, "cap_arrows")
    make_arrow(data, name, data_root)
    return data_root


def test_overfit_pretrain(tmp_path_factory, tmp_path):
    """mlm+mim+itm multi-task: memorize 6 pairs -> high masked-token
    accuracy, perfect match/mismatch discrimination, shrinking MIM loss."""
    from mm_vqa_healthcare_tpu import config as C
    from mm_vqa_healthcare_tpu.train.trainer import Trainer
    root = tmp_path_factory.mktemp("overfit_pretrain")
    data_root = _make_overfit_caption_fixture(str(root), name="roco")
    vocab = fixtures.write_vocab(str(root / "vocab.txt"))
    cfg = C.compose(["task_pretrain_m3ae", "tiny_debug"])
    cfg.update(
        datasets=["roco"], data_root=data_root, tokenizer_path=vocab,
        attention_impl="xla", num_workers=0, mim_layer=1,
        mesh_shape={"data": 2}, per_gpu_batchsize=2, batch_size=4,
        device_transforms=False,
    )
    cfg.update(_overfit_overrides(tmp_path, 500))
    t = Trainer(cfg)
    t.setup_data()
    t.init_params()
    before = t.evaluate("val")
    metrics = t.fit()
    # Bars calibrated on the round-4 run (val==train pairs): mlm saturates
    # at 1.0 by ~step 250; itm runs 0.75-1.0 on small eval batches (one
    # ambiguous draw flips 1/6); mim/loss falls 1.0 -> ~0.6 and then
    # flattens — memorizing exact noise pixels through the masked
    # autoencoder at hidden=32 has a high floor, so the assertion is a
    # robust one-third reduction, not near-zero.
    # itm bar 0.75: the lane's own calibration note below documents the
    # 0.75-1.0 band on these small eval batches (one ambiguous draw flips
    # 1/6) — the old 0.80 bar contradicted it and flaked in round 5
    assert metrics["itm/accuracy"] >= 0.75, metrics
    assert metrics["mlm/accuracy"] >= 0.80, metrics
    assert metrics["mim/loss"] < 0.67 * before["mim/loss"], (before, metrics)
    assert metrics["mlm/accuracy"] > before.get("mlm/accuracy", 0.0) + 0.3
