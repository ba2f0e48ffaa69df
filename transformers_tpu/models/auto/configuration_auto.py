"""AutoConfig + model_type registry.

TPU-native analog of reference src/transformers/models/auto/configuration_auto.py.
Mappings are lazy (module path + class name strings) so importing
``transformers_tpu`` stays cheap with hundreds of families registered
(reference _LazyModule analog at the registry level).
"""

from __future__ import annotations

import importlib
from typing import Optional

from ...configuration_utils import PretrainedConfig
from ...utils.hub import CONFIG_NAME, cached_file

# model_type -> (module under transformers_tpu.models, config class name)
CONFIG_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "llama": ("llama", "LlamaConfig"),
    "cwm": ("cwm", "CwmConfig"),
    "minicpm3": ("minicpm3", "MiniCPM3Config"),
    "minimax_m2": ("minimax_m2", "MiniMaxM2Config"),
    "glm4_moe_lite": ("glm4_moe_lite", "Glm4MoeLiteConfig"),
    "youtu": ("youtu", "YoutuConfig"),
    "exaone_moe": ("exaone_moe", "ExaoneMoeConfig"),
    "lfm2_moe": ("lfm2_moe", "Lfm2MoeConfig"),
    "jais2": ("jais2", "Jais2Config"),
    "solar_open": ("solar_open", "SolarOpenConfig"),
    "granite_swa": ("granite_swa", "GraniteSWAConfig"),
    "mistral": ("mistral", "MistralConfig"),
    "qwen2": ("qwen2", "Qwen2Config"),
    "qwen3": ("qwen3", "Qwen3Config"),
    "gemma": ("gemma", "GemmaConfig"),
    "gemma2": ("gemma2", "Gemma2Config"),
    "phi3": ("phi3", "Phi3Config"),
    "gpt2": ("gpt2", "GPT2Config"),
    "ctrl": ("ctrl", "CTRLConfig"),
    "openai-gpt": ("openai", "OpenAIGPTConfig"),
    "xlm": ("xlm", "XLMConfig"),
    "flaubert": ("flaubert", "FlaubertConfig"),
    "mbart": ("mbart", "MBartConfig"),
    "moonshine": ("moonshine", "MoonshineConfig"),
    "mvp": ("mvp", "MvpConfig"),
    "pegasus_x": ("pegasus_x", "PegasusXConfig"),
    "tapas": ("tapas", "TapasConfig"),
    "pegasus": ("pegasus", "PegasusConfig"),
    "marian": ("marian", "MarianConfig"),
    "m2m_100": ("m2m_100", "M2M100Config"),
    "nllb": ("m2m_100", "M2M100Config"),
    "nllb-moe": ("nllb_moe", "NllbMoeConfig"),
    "prophetnet": ("prophetnet", "ProphetNetConfig"),
    "reformer": ("reformer", "ReformerConfig"),
    "ministral3": ("ministral3", "Ministral3Config"),
    "hyperclovax": ("hyperclovax", "HyperCLOVAXConfig"),
    "nanochat": ("nanochat", "NanoChatConfig"),
    "eurobert": ("eurobert", "EuroBertConfig"),
    "parakeet_encoder": ("parakeet", "ParakeetEncoderConfig"),
    "parakeet_ctc": ("parakeet", "ParakeetCTCConfig"),
    "parakeet_rnnt": ("parakeet", "ParakeetRNNTConfig"),
    "parakeet_tdt": ("parakeet", "ParakeetTDTConfig"),
    "paligemma": ("paligemma", "PaliGemmaConfig"),
    "colpali": ("colpali", "ColPaliConfig"),
    "colqwen2": ("colqwen2", "ColQwen2Config"),
    "gemma3": ("gemma3", "Gemma3Config"),
    "layoutlm": ("layoutlm", "LayoutLMConfig"),
    "layoutlmv3": ("layoutlmv3", "LayoutLMv3Config"),
    "sam": ("sam", "SamConfig"),
    "sam2": ("sam2", "Sam2Config"),
    "sam2_vision_model": ("sam2", "Sam2VisionConfig"),
    "sam2_hiera_det_model": ("sam2", "Sam2HieraDetConfig"),
    "superpoint": ("superpoint", "SuperPointConfig"),
    "vits": ("vits", "VitsConfig"),
    "clap": ("clap", "ClapConfig"),
    "deberta-v2": ("deberta_v2", "DebertaV2Config"),
    "deberta": ("deberta", "DebertaConfig"),
    "ibert": ("ibert", "IBertConfig"),
    "xlm-roberta-xl": ("xlm_roberta_xl", "XLMRobertaXLConfig"),
    "nystromformer": ("nystromformer", "NystromformerConfig"),
    "yoso": ("yoso", "YosoConfig"),
    "xmod": ("xmod", "XmodConfig"),
    "roc_bert": ("roc_bert", "RoCBertConfig"),
    "olmo": ("olmo", "OlmoConfig"),
    "olmoe": ("olmoe", "OlmoeConfig"),
    "dbrx": ("dbrx", "DbrxConfig"),
    "helium": ("helium", "HeliumConfig"),
    "arcee": ("arcee", "ArceeConfig"),
    "ernie4_5": ("ernie4_5", "Ernie4_5Config"),
    "exaone4": ("exaone4", "Exaone4Config"),
    "seed_oss": ("seed_oss", "SeedOssConfig"),
    "granitemoe": ("granitemoe", "GraniteMoeConfig"),
    "trocr": ("trocr", "TrOCRConfig"),
    "vision-encoder-decoder": ("vision_encoder_decoder", "VisionEncoderDecoderConfig"),
    "encoder-decoder": ("encoder_decoder", "EncoderDecoderConfig"),
    "speech-encoder-decoder": ("speech_encoder_decoder", "SpeechEncoderDecoderConfig"),
    "vision-text-dual-encoder": ("vision_text_dual_encoder", "VisionTextDualEncoderConfig"),
    "superglue": ("superglue", "SuperGlueConfig"),
    "sam_vision_model": ("sam", "SamVisionConfig"),
    "glm": ("glm", "GlmConfig"),
    "glm4": ("glm4", "Glm4Config"),
    "nemotron": ("nemotron", "NemotronConfig"),
    "persimmon": ("persimmon", "PersimmonConfig"),
    "bloom": ("bloom", "BloomConfig"),
    "mpt": ("mpt", "MptConfig"),
    "gpt_neo": ("gpt_neo", "GPTNeoConfig"),
    "codegen": ("codegen", "CodeGenConfig"),
    "gpt_neox": ("gpt_neox", "GPTNeoXConfig"),
    "gptj": ("gptj", "GPTJConfig"),
    "falcon": ("falcon", "FalconConfig"),
    "deepseek_v3": ("deepseek_v3", "DeepseekV3Config"),
    "gpt_oss": ("gpt_oss", "GptOssConfig"),
    "opt": ("opt", "OPTConfig"),
    "cohere": ("cohere", "CohereConfig"),
    "granite": ("granite", "GraniteConfig"),
    "mixtral": ("mixtral", "MixtralConfig"),
    "bert": ("bert", "BertConfig"),
    "bert-generation": ("bert_generation", "BertGenerationConfig"),
    "roberta-prelayernorm": ("roberta_prelayernorm", "RobertaPreLayerNormConfig"),
    "splinter": ("splinter", "SplinterConfig"),
    "dpr": ("dpr", "DPRConfig"),
    "roberta": ("roberta", "RobertaConfig"),
    "mpnet": ("mpnet", "MPNetConfig"),
    "xlm-roberta": ("xlm_roberta", "XLMRobertaConfig"),
    "camembert": ("camembert", "CamembertConfig"),
    "distilbert": ("distilbert", "DistilBertConfig"),
    "electra": ("electra", "ElectraConfig"),
    "albert": ("albert", "AlbertConfig"),
    "modernbert": ("modernbert", "ModernBertConfig"),
    "resnet": ("resnet", "ResNetConfig"),
    "detr": ("detr", "DetrConfig"),
    "convnext": ("convnext", "ConvNextConfig"),
    "convnextv2": ("convnextv2", "ConvNextV2Config"),
    "cpmant": ("cpmant", "CpmAntConfig"),
    "swin": ("swin", "SwinConfig"),
    "donut-swin": ("donut", "DonutSwinConfig"),
    "deit": ("deit", "DeiTConfig"),
    "dinov2": ("dinov2", "Dinov2Config"),
    "segformer": ("segformer", "SegformerConfig"),
    "glpn": ("glpn", "GLPNConfig"),
    "timesformer": ("timesformer", "TimesformerConfig"),
    "vit_mae": ("vit_mae", "ViTMAEConfig"),
    "videomae": ("videomae", "VideoMAEConfig"),
    "owlvit": ("owlvit", "OwlViTConfig"),
    "blip": ("blip", "BlipConfig"),
    "qwen2_5_vl": ("qwen2_5_vl", "Qwen2_5_VLConfig"),
    "wav2vec2": ("wav2vec2", "Wav2Vec2Config"),
    "wav2vec2-conformer": ("wav2vec2_conformer", "Wav2Vec2ConformerConfig"),
    "wav2vec2-bert": ("wav2vec2_bert", "Wav2Vec2BertConfig"),
    "seamless_m4t": ("seamless_m4t", "SeamlessM4TConfig"),
    "seamless_m4t_v2": ("seamless_m4t_v2", "SeamlessM4Tv2Config"),
    "hubert": ("hubert", "HubertConfig"),
    "wavlm": ("wavlm", "WavLMConfig"),
    "mamba": ("mamba", "MambaConfig"),
    "falcon_mamba": ("falcon_mamba", "FalconMambaConfig"),
    "mamba2": ("mamba2", "Mamba2Config"),
    "lfm2": ("lfm2", "Lfm2Config"),
    "bamba": ("bamba", "BambaConfig"),
    "jetmoe": ("jetmoe", "JetMoeConfig"),
    "jamba": ("jamba", "JambaConfig"),
    "zamba": ("zamba", "ZambaConfig"),
    "zamba2": ("zamba2", "Zamba2Config"),
    "dac": ("dac", "DacConfig"),
    "xcodec": ("xcodec", "XcodecConfig"),
    "nemotron_h": ("nemotron_h", "NemotronHConfig"),
    "granitemoehybrid": ("granitemoehybrid", "GraniteMoeHybridConfig"),
    "falcon_h1": ("falcon_h1", "FalconH1Config"),
    "gpt_bigcode": ("gpt_bigcode", "GPTBigCodeConfig"),
    "biogpt": ("biogpt", "BioGptConfig"),
    "xglm": ("xglm", "XGLMConfig"),
    "ernie": ("ernie", "ErnieConfig"),
    "unispeech": ("unispeech", "UniSpeechConfig"),
    "unispeech-sat": ("unispeech_sat", "UniSpeechSatConfig"),
    "data2vec-audio": ("data2vec", "Data2VecAudioConfig"),
    "sew": ("sew", "SEWConfig"),
    "sew-d": ("sew_d", "SEWDConfig"),
    "longformer": ("longformer", "LongformerConfig"),
    "big_bird": ("big_bird", "BigBirdConfig"),
    "esm": ("esm", "EsmConfig"),
    "speech_to_text": ("speech_to_text", "Speech2TextConfig"),
    "speecht5": ("speecht5", "SpeechT5Config"),
    "mimi": ("mimi", "MimiConfig"),
    "moshi": ("moshi", "MoshiConfig"),
    "pix2struct": ("pix2struct", "Pix2StructConfig"),
    "fuyu": ("fuyu", "FuyuConfig"),
    "kosmos-2": ("kosmos2", "Kosmos2Config"),
    "llava_next": ("llava_next", "LlavaNextConfig"),
    "llava_next_video": ("llava_next_video", "LlavaNextVideoConfig"),
    "llava_onevision": ("llava_onevision", "LlavaOnevisionConfig"),
    "aya_vision": ("aya_vision", "AyaVisionConfig"),
    "internvl": ("internvl", "InternVLConfig"),
    "internvl_vision": ("internvl", "InternVLVisionConfig"),
    "mobilevit": ("mobilevit", "MobileViTConfig"),
    "mobilevitv2": ("mobilevitv2", "MobileViTV2Config"),
    "table-transformer": ("table_transformer", "TableTransformerConfig"),
    "yolos": ("yolos", "YolosConfig"),
    "levit": ("levit", "LevitConfig"),
    "poolformer": ("poolformer", "PoolFormerConfig"),
    "bit": ("bit", "BitConfig"),
    "pvt": ("pvt", "PvtConfig"),
    "swinv2": ("swinv2", "Swinv2Config"),
    "cvt": ("cvt", "CvtConfig"),
    "recurrent_gemma": ("recurrent_gemma", "RecurrentGemmaConfig"),
    "rwkv": ("rwkv", "RwkvConfig"),
    "xlnet": ("xlnet", "XLNetConfig"),
    "squeezebert": ("squeezebert", "SqueezeBertConfig"),
    "convbert": ("convbert", "ConvBertConfig"),
    "mobilebert": ("mobilebert", "MobileBertConfig"),
    "time_series_transformer": ("time_series_transformer", "TimeSeriesTransformerConfig"),
    "informer": ("informer", "InformerConfig"),
    "autoformer": ("autoformer", "AutoformerConfig"),
    "hifigan": ("speecht5", "SpeechT5HifiGanConfig"),
    "plbart": ("plbart", "PLBartConfig"),
    "blenderbot": ("blenderbot", "BlenderbotConfig"),
    "blenderbot-small": ("blenderbot_small", "BlenderbotSmallConfig"),
    "led": ("led", "LEDConfig"),
    "cohere2": ("cohere2", "Cohere2Config"),
    "phimoe": ("phimoe", "PhimoeConfig"),
    "glm4_moe": ("glm4_moe", "Glm4MoeConfig"),
    "glm4v": ("glm4v", "Glm4vConfig"),
    "glm4v_text": ("glm4v", "Glm4vTextConfig"),
    "glm4v_moe": ("glm4v_moe", "Glm4vMoeConfig"),
    "glm4v_moe_text": ("glm4v_moe", "Glm4vMoeTextConfig"),
    # torch 4.57 serializes the text sub-config with this casing quirk
    "Glm4vMoe_text": ("glm4v_moe", "Glm4vMoeTextConfig"),
    "beit": ("beit", "BeitConfig"),
    "dpt": ("dpt", "DPTConfig"),
    "depth_anything": ("depth_anything", "DepthAnythingConfig"),
    "patchtst": ("patchtst", "PatchTSTConfig"),
    "owlv2": ("owlv2", "Owlv2Config"),
    "git": ("git", "GitConfig"),
    "encodec": ("encodec", "EncodecConfig"),
    "musicgen": ("musicgen", "MusicgenConfig"),
    "musicgen_melody": ("musicgen_melody", "MusicgenMelodyConfig"),
    "mobilenet_v2": ("mobilenet_v2", "MobileNetV2Config"),
    "regnet": ("regnet", "RegNetConfig"),
    "efficientnet": ("efficientnet", "EfficientNetConfig"),
    "qwen2_audio": ("qwen2_audio", "Qwen2AudioConfig"),
    "voxtral": ("voxtral", "VoxtralConfig"),
    "voxtral_encoder": ("voxtral", "VoxtralEncoderConfig"),
    "roformer": ("roformer", "RoFormerConfig"),
    "fnet": ("fnet", "FNetConfig"),
    "rembert": ("rembert", "RemBertConfig"),
    "megatron-bert": ("megatron_bert", "MegatronBertConfig"),
    "vit": ("vit", "ViTConfig"),
    "audio-spectrogram-transformer": ("audio_spectrogram_transformer", "ASTConfig"),
    "ijepa": ("ijepa", "IJepaConfig"),
    "vit_msn": ("vit_msn", "ViTMSNConfig"),
    "vivit": ("vivit", "VivitConfig"),
    "align": ("align", "AlignConfig"),
    "altclip": ("altclip", "AltCLIPConfig"),
    "canine": ("canine", "CanineConfig"),
    "chinese_clip": ("chinese_clip", "ChineseCLIPConfig"),
    "clip": ("clip", "CLIPConfig"),
    "metaclip_2": ("metaclip_2", "MetaClip2Config"),
    "metaclip_2_text_model": ("metaclip_2", "MetaClip2TextConfig"),
    "metaclip_2_vision_model": ("metaclip_2", "MetaClip2VisionConfig"),
    "funnel": ("funnel", "FunnelConfig"),
    "groupvit": ("groupvit", "GroupViTConfig"),
    "xclip": ("x_clip", "XCLIPConfig"),
    "clip_text_model": ("clip", "CLIPTextConfig"),
    "clip_vision_model": ("clip", "CLIPVisionConfig"),
    "siglip": ("siglip", "SiglipConfig"),
    "siglip_text_model": ("siglip", "SiglipTextConfig"),
    "siglip_vision_model": ("siglip", "SiglipVisionConfig"),
    "whisper": ("whisper", "WhisperConfig"),
    "llava": ("llava", "LlavaConfig"),
    "vipllava": ("vipllava", "VipLlavaConfig"),
    "blip-2": ("blip_2", "Blip2Config"),
    "instructblip": ("instructblip", "InstructBlipConfig"),
    "longt5": ("longt5", "LongT5Config"),
    "bigbird_pegasus": ("bigbird_pegasus", "BigBirdPegasusConfig"),
    "t5": ("t5", "T5Config"),
    "mt5": ("mt5", "MT5Config"),
    "umt5": ("umt5", "UMT5Config"),
    "switch_transformers": ("switch_transformers", "SwitchTransformersConfig"),
    "bart": ("bart", "BartConfig"),
    "olmo2": ("olmo2", "Olmo2Config"),
    "olmo3": ("olmo3", "Olmo3Config"),
    "vaultgemma": ("vaultgemma", "VaultGemmaConfig"),
    "ministral": ("ministral", "MinistralConfig"),
    "bitnet": ("bitnet", "BitNetConfig"),
    "apertus": ("apertus", "ApertusConfig"),
    "granitemoeshared": ("granitemoeshared", "GraniteMoeSharedConfig"),
    "flex_olmo": ("flex_olmo", "FlexOlmoConfig"),
    "hunyuan_v1_dense": ("hunyuan_v1_dense", "HunYuanDenseV1Config"),
    "hunyuan_v1_moe": ("hunyuan_v1_moe", "HunYuanMoEV1Config"),
    "modernbert-decoder": ("modernbert_decoder", "ModernBertDecoderConfig"),
    "gpt_neox_japanese": ("gpt_neox_japanese", "GPTNeoXJapaneseConfig"),
    "doge": ("doge", "DogeConfig"),
    "imagegpt": ("imagegpt", "ImageGPTConfig"),
    "visual_bert": ("visual_bert", "VisualBertConfig"),
    "vilt": ("vilt", "ViltConfig"),
    "lxmert": ("lxmert", "LxmertConfig"),
    "markuplm": ("markuplm", "MarkupLMConfig"),
    "lilt": ("lilt", "LiltConfig"),
    "fsmt": ("fsmt", "FSMTConfig"),
    "decision_transformer": ("decision_transformer", "DecisionTransformerConfig"),
    "minimax": ("minimax", "MiniMaxConfig"),
    "dinov2_with_registers": ("dinov2_with_registers", "Dinov2WithRegistersConfig"),
    "mobilenet_v1": ("mobilenet_v1", "MobileNetV1Config"),
    "vitpose_backbone": ("vitpose_backbone", "VitPoseBackboneConfig"),
    "vitpose": ("vitpose", "VitPoseConfig"),
    "swiftformer": ("swiftformer", "SwiftFormerConfig"),
    "textnet": ("textnet", "TextNetConfig"),
    "hgnet_v2": ("hgnet_v2", "HGNetV2Config"),
    "pvt_v2": ("pvt_v2", "PvtV2Config"),
    "diffllama": ("diffllama", "DiffLlamaConfig"),
    "dots1": ("dots1", "Dots1Config"),
    "deepseek_v2": ("deepseek_v2", "DeepseekV2Config"),
    "siglip2": ("siglip2", "Siglip2Config"),
    "idefics2": ("idefics2", "Idefics2Config"),
    "idefics3": ("idefics3", "Idefics3Config"),
    "pixtral": ("pixtral", "PixtralVisionConfig"),
    "llama4": ("llama4", "Llama4Config"),
    "llama4_text": ("llama4", "Llama4TextConfig"),
    "mistral3": ("mistral3", "Mistral3Config"),
    "chameleon": ("chameleon", "ChameleonConfig"),
    "mllama": ("mllama", "MllamaConfig"),
    "mllama_text_model": ("mllama", "MllamaTextConfig"),
    "mllama_vision_model": ("mllama", "MllamaVisionConfig"),
    "smolvlm": ("smolvlm", "SmolVLMConfig"),
    "siglip2_vision_model": ("siglip2", "Siglip2VisionConfig"),
    "siglip2_text_model": ("siglip2", "Siglip2TextConfig"),
    "ernie4_5_moe": ("ernie4_5_moe", "Ernie4_5_MoeConfig"),
    "starcoder2": ("starcoder2", "Starcoder2Config"),
    "stablelm": ("stablelm", "StableLmConfig"),
    "phi": ("phi", "PhiConfig"),
    "qwen2_moe": ("qwen2_moe", "Qwen2MoeConfig"),
    "gemma3_text": ("gemma3", "Gemma3TextConfig"),
    "gemma3n_text": ("gemma3n", "Gemma3nTextConfig"),
    "smollm3": ("smollm3", "SmolLM3Config"),
    "qwen3_moe": ("qwen3_moe", "Qwen3MoeConfig"),
    "qwen3_next": ("qwen3_next", "Qwen3NextConfig"),
    "qwen3_vl": ("qwen3_vl", "Qwen3VLConfig"),
    "qwen3_vl_text": ("qwen3_vl", "Qwen3VLTextConfig"),
    "qwen3_vl_moe": ("qwen3_vl_moe", "Qwen3VLMoeConfig"),
    "qwen3_vl_moe_text": ("qwen3_vl_moe", "Qwen3VLMoeTextConfig"),
    "qwen2_vl": ("qwen2_vl", "Qwen2VLConfig"),
    "qwen2_vl_text": ("qwen2_vl", "Qwen2VLTextConfig"),
}


def register_config(model_type: str, module: str, class_name: str) -> None:
    CONFIG_MAPPING_NAMES[model_type] = (module, class_name)


def get_config_class(model_type: str) -> type[PretrainedConfig]:
    if model_type not in CONFIG_MAPPING_NAMES:
        raise KeyError(
            f"Unknown model_type {model_type!r}. Known: {sorted(CONFIG_MAPPING_NAMES)}"
        )
    module_name, class_name = CONFIG_MAPPING_NAMES[model_type]
    module = importlib.import_module(f"transformers_tpu.models.{module_name}")
    return getattr(module, class_name)


class AutoConfig:
    """reference models/auto/configuration_auto.py AutoConfig."""

    def __init__(self):
        raise OSError("AutoConfig is instantiated via from_pretrained / for_model_type.")

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, **kwargs) -> PretrainedConfig:
        import json

        trust_remote_code = kwargs.pop("trust_remote_code", None)
        resolved = cached_file(str(pretrained_model_name_or_path), kwargs.pop("config_file", CONFIG_NAME))
        with open(resolved, encoding="utf-8") as f:
            config_dict = json.load(f)
        model_type = config_dict.get("model_type")
        auto_map = config_dict.get("auto_map") or {}
        if "AutoConfig" in auto_map and (model_type not in CONFIG_MAPPING_NAMES):
            from ...dynamic_module_utils import (
                get_class_from_dynamic_module,
                resolve_trust_remote_code,
            )

            resolve_trust_remote_code(trust_remote_code, str(pretrained_model_name_or_path),
                                      has_local_code=False, has_remote_code=True)
            config_cls = get_class_from_dynamic_module(auto_map["AutoConfig"],
                                                       pretrained_model_name_or_path)
            return config_cls.from_dict({**config_dict,
                                         "_name_or_path": str(pretrained_model_name_or_path)}, **kwargs)
        if model_type is None:
            raise ValueError(f"config.json at {pretrained_model_name_or_path} has no model_type.")
        if model_type not in CONFIG_MAPPING_NAMES and auto_map:
            # remote-code checkpoint without a custom AutoConfig: a generic
            # config carries the fields (reference falls back the same way)
            return PretrainedConfig.from_dict(
                {**config_dict, "_name_or_path": str(pretrained_model_name_or_path)}, **kwargs)
        config_cls = get_config_class(model_type)
        config = config_cls.from_dict({**config_dict, "_name_or_path": str(pretrained_model_name_or_path)}, **kwargs)
        return config

    @classmethod
    def for_model_type(cls, model_type: Optional[str], **kwargs) -> PretrainedConfig:
        if model_type is None:
            raise ValueError("model_type is required")
        return get_config_class(model_type)(**kwargs)

    @staticmethod
    def register(model_type: str, config_cls: type[PretrainedConfig]) -> None:
        module = config_cls.__module__.split(".")[-2] if "." in config_cls.__module__ else config_cls.__module__
        CONFIG_MAPPING_NAMES[model_type] = (module, config_cls.__name__)
