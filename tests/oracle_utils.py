"""Torch oracles for parity tests.

The reference's torch modules are used as *test oracles only* (never at
runtime): clip_model.py is loaded directly from /root/reference when
available (it depends only on torch/numpy/tqdm), bypassing the package
__init__ which needs pytorch_lightning.  HF transformers BertModel serves
as the text-encoder oracle.
"""

import importlib.util
import os

REFERENCE_ROOT = os.environ.get("MMVQA_REFERENCE", "/root/reference")


def load_reference_module(rel_path: str, name: str):
    path = os.path.join(REFERENCE_ROOT, rel_path)
    if not os.path.isfile(path):
        return None
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception:
        return None
    return mod


def reference_clip_model():
    return load_reference_module(
        "m3ae/modules/vision_encoders/clip_model.py", "ref_clip_model")


# ---------------------------------------------------------------------------
# Full-model oracle: instantiate the reference M3AETransformerSS on CPU with
# random weights.  The environment lacks pytorch_lightning / torchmetrics /
# timm / nltk / rouge_score and has zero egress (no CLIP/BERT downloads), so
# the import graph is satisfied with inert stubs and the pretrained loaders
# are patched to config-shaped random init.  Reference: m3ae_module.py:16-202.
# ---------------------------------------------------------------------------

def _stub_module(name, **attrs):
    import importlib.machinery
    import sys
    import types
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        # a real ModuleSpec so importlib.util.find_spec probes (e.g.
        # transformers' _is_package_available) don't explode
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _install_reference_stubs():
    import sys
    import types
    import torch
    import torch.nn as nn

    if "pytorch_lightning" not in sys.modules:
        class LightningModule(nn.Module):
            def save_hyperparameters(self):
                import inspect
                frame = inspect.currentframe().f_back
                cfg = frame.f_locals.get("config")
                object.__setattr__(self, "_hparams_ns",
                                   types.SimpleNamespace(config=cfg))

            @property
            def hparams(self):
                return self._hparams_ns

        _stub_module("pytorch_lightning", LightningModule=LightningModule)

    class _Metric:
        def __init__(self, *a, **k):
            pass

        def add_state(self, name, default=None, dist_reduce_fx=None):
            setattr(self, name, default)

    _stub_module("torchmetrics", Metric=_Metric)
    _stub_module("nltk")
    _stub_module("nltk.translate")
    class _Smoothing:
        def __getattr__(self, name):          # .method1 etc.
            return lambda *a, **k: 0.0

    _stub_module("nltk.translate.bleu_score",
                 sentence_bleu=lambda *a, **k: 0.0,
                 SmoothingFunction=_Smoothing)
    class _RougeScorer:
        def __init__(self, *a, **k):
            pass

        def score(self, *a, **k):
            return {}

    _stub_module("rouge_score", rouge_scorer=types.SimpleNamespace(
        RougeScorer=_RougeScorer))

    # timm (swin files import it at module level; swin is not instantiated)
    ident = lambda x=None, *a, **k: x  # noqa: E731
    _stub_module("timm")
    _stub_module("timm.data", IMAGENET_DEFAULT_MEAN=(0.485, 0.456, 0.406),
                 IMAGENET_DEFAULT_STD=(0.229, 0.224, 0.225))
    _stub_module("timm.models")
    _stub_module("timm.models.features", FeatureListNet=object,
                 FeatureHookNet=object)
    _stub_module("timm.models.hub", has_hf_hub=lambda *a, **k: False,
                 download_cached_file=ident, load_state_dict_from_hf=ident,
                 load_state_dict_from_url=ident)

    class _DropPath(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    def _to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    class _PatchEmbed(nn.Module):
        """timm PatchEmbed (conv proj + flatten + optional norm) — real
        implementation so the vendored swin is instantiable as an oracle."""

        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None, flatten=True):
            super().__init__()
            img_size = _to_2tuple(img_size)
            patch_size = _to_2tuple(patch_size)
            self.img_size = img_size
            self.patch_size = patch_size
            self.grid_size = (img_size[0] // patch_size[0],
                              img_size[1] // patch_size[1])
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.proj = nn.Conv2d(in_chans, embed_dim,
                                  kernel_size=patch_size, stride=patch_size)
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

        def forward(self, x):
            x = self.proj(x).flatten(2).transpose(1, 2)
            return self.norm(x)

    class _Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.drop = nn.Dropout(drop)
            self.fc2 = nn.Linear(hidden_features, out_features)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    _stub_module("timm.models.layers", Conv2dSame=nn.Conv2d, Linear=nn.Linear,
                 PatchEmbed=_PatchEmbed, Mlp=_Mlp, DropPath=_DropPath,
                 to_2tuple=_to_2tuple,
                 trunc_normal_=torch.nn.init.trunc_normal_)
    _stub_module("timm.models.helpers",
                 overlay_external_default_cfg=ident)
    _stub_module("timm.models.registry",
                 register_model=lambda fn: fn)
    _stub_module("timm.models.vision_transformer",
                 checkpoint_filter_fn=ident, _init_vit_weights=ident)

    # transformers >= 4.46 removed optimization.AdamW (m3ae_utils imports it)
    import transformers.optimization as topt
    if not hasattr(topt, "AdamW"):
        topt.AdamW = torch.optim.AdamW

    # modern transformers moved these helpers to pytorch_utils; the vendored
    # bert_model.py still imports them from modeling_utils
    import transformers.modeling_utils as tmu
    import transformers.pytorch_utils as tpu_utils
    for fname in ("apply_chunking_to_forward",
                  "find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(tmu, fname) and hasattr(tpu_utils, fname):
            setattr(tmu, fname, getattr(tpu_utils, fname))

    # the docstring decorators changed signature across transformers
    # versions (tokenizer_class kw removed) — inert replacements
    import transformers.file_utils as tfu

    def _doc_deco(*a, **k):
        def deco(fn):
            return fn
        return deco

    for dname in ("add_code_sample_docstrings", "add_start_docstrings",
                  "add_start_docstrings_to_model_forward",
                  "replace_return_docstrings"):
        setattr(tfu, dname, _doc_deco)

    # the m3ae.modules package __init__ imports m3ae_t5_text_encoder_input,
    # which is missing at reference HEAD — pre-seed the package modules so
    # submodule imports bypass the __init__ files entirely
    for name, rel in (("m3ae", "m3ae"),
                      ("m3ae.modules", "m3ae/modules"),
                      ("m3ae.gadgets", "m3ae/gadgets"),
                      ("m3ae.modules.language_encoders",
                       "m3ae/modules/language_encoders"),
                      ("m3ae.modules.vision_encoders",
                       "m3ae/modules/vision_encoders")):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [os.path.join(REFERENCE_ROOT, rel)]
            sys.modules[name] = pkg


def reference_full_model(ref_config):
    """Instantiate reference M3AETransformerSS(ref_config) with random
    weights (pretrained loaders patched out), eval mode.  Returns
    (module_namespace, model) or (None, None) when unavailable."""
    import torch
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "m3ae")):
        return None, None
    _install_reference_stubs()
    import importlib

    try:
        mm = importlib.import_module("m3ae.modules.m3ae_module")
    except Exception:
        return None, None

    # my_metrics.BLEUScore.__init__ loads the bert tokenizer from the HF hub
    # (zero-egress); the metric itself is never exercised by the oracle
    import types as _types
    mym = importlib.import_module("m3ae.gadgets.my_metrics")

    class _TokStub:
        @staticmethod
        def from_pretrained(*a, **k):
            return _types.SimpleNamespace(tokenize=lambda s: s.split())

    mym.BertTokenizerFast = _TokStub

    from transformers.models.bert.modeling_bert import BertConfig, BertModel

    def fake_bert_from_pretrained(name, *a, **k):
        # bert-base-uncased == the BertConfig defaults (random init oracle)
        torch.manual_seed(7)
        return BertModel(BertConfig())

    def fake_build_model(name, resolution_after=224, jit=False):
        clip_mod = importlib.import_module(
            "m3ae.modules.vision_encoders.clip_model")
        torch.manual_seed(11)
        # ViT-B/16 CLIP dims (clip_model.py:259-297 derives these from the
        # downloaded state_dict; zero-egress, so they are pinned here)
        return clip_mod.CLIP(
            embed_dim=512, image_resolution=224, vision_layers=12,
            vision_width=768, vision_patch_size=16, context_length=77,
            vocab_size=49408, transformer_width=512, transformer_heads=8,
            transformer_layers=12, resolution_after=resolution_after)

    orig_build, orig_bert = mm.build_model, mm.BertModel.from_pretrained
    mm.build_model = fake_build_model
    mm.BertModel.from_pretrained = staticmethod(fake_bert_from_pretrained)
    try:
        torch.manual_seed(0)
        model = mm.M3AETransformerSS(ref_config).eval()
    finally:
        mm.build_model = orig_build
        mm.BertModel.from_pretrained = orig_bert
    return mm, model
