"""Model components. Importing this package registers target aliases so the
reference's Hydra YAMLs (``promptttspp.*`` targets) instantiate our modules.
"""

from promptttspp_tpu.config import register_target

_ALIASES = {
    "promptttspp.models.prompttts_mdn_v2_final.model.PromptTTSMDNDurCFG":
        "promptttspp_tpu.models.prompttts.PromptTTSMDNDurCFG",
    "promptttspp.layers.embedding.PhonemeEmbedding":
        "promptttspp_tpu.models.phoneme_embedding.PhonemeEmbedding",
    "promptttspp.modules.esp.ConformerEncoder":
        "promptttspp_tpu.nn.conformer.ConformerEncoder",
    "promptttspp.modules.variance_adaptor.VarianceAdaptor":
        "promptttspp_tpu.models.variance_adaptor.VarianceAdaptor",
    "promptttspp.modules.variance_adaptor.MDNPredictor":
        "promptttspp_tpu.models.variance_adaptor.MDNPredictor",
    "promptttspp.modules.variance_adaptor.Predictor":
        "promptttspp_tpu.models.variance_adaptor.Predictor",
    "torch.nn.Conv1d":
        "promptttspp_tpu.models.variance_adaptor.PitchEmb",
    "promptttspp.modules.frame_prior.FramePriorNetwork":
        "promptttspp_tpu.models.frame_prior.FramePriorNetwork",
    "promptttspp.modules.style_encoder.StyleEncoder":
        "promptttspp_tpu.models.style_encoder.StyleEncoder",
    "promptttspp.modules.prompt_encoder.PromptEncoder":
        "promptttspp_tpu.models.prompt_encoder.PromptEncoder",
    "promptttspp.modules.mdn.MDNLayer":
        "promptttspp_tpu.nn.mdn.MDNLayer",
    "promptttspp.modules.diffusion.GaussianDiffusion":
        "promptttspp_tpu.models.diffusion.GaussianDiffusion",
    "promptttspp.modules.denoiser.DiffNet":
        "promptttspp_tpu.models.diffusion.DiffNet",
    "promptttspp.vocoders.bigvgan.BigVGAN":
        "promptttspp_tpu.vocoders.bigvgan.BigVGAN",
    "promptttspp.vocoders.bigvgan_f0.F0AwareBigVGAN":
        "promptttspp_tpu.vocoders.bigvgan_f0.F0AwareBigVGAN",
    "promptttspp.transforms.MelSpectrogramTransform":
        "promptttspp_tpu.ops.mel.MelSpectrogramTransform",
    "promptttspp.transforms.mel.MelSpectrogramTransform":
        "promptttspp_tpu.ops.mel.MelSpectrogramTransform",
}

for ref_name, ours in _ALIASES.items():
    register_target(ref_name, alias_of=ours)
