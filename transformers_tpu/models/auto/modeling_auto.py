"""Auto model classes (reference src/transformers/models/auto/modeling_auto.py,
auto_factory.py:194 ``_BaseAutoModelClass``).

Task mappings are lazy: model_type -> (module, class name). ``register``
lets user code add architectures (reference auto_factory.py:411).
"""

from __future__ import annotations

import importlib

from .configuration_auto import AutoConfig

# task mapping tables: model_type -> (module under transformers_tpu.models, class name)
MODEL_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "funnel": ("funnel", "FunnelModel"),
    "canine": ("canine", "CanineModelStandalone"),
    "tapas": ("tapas", "TapasModelStandalone"),
    "llama": ("llama", "LlamaModelStandalone"),
    "jetmoe": ("jetmoe", "JetMoeModelStandalone"),
    "mistral": ("mistral", "MistralModelStandalone"),
    "qwen2": ("qwen2", "Qwen2ModelStandalone"),
    "qwen3": ("qwen3", "Qwen3ModelStandalone"),
    "gemma": ("gemma", "GemmaModelStandalone"),
    "gemma2": ("gemma2", "Gemma2ModelStandalone"),
    "phi3": ("phi3", "Phi3ModelStandalone"),
    "gpt2": ("gpt2", "GPT2ModelStandalone"),
    "ctrl": ("ctrl", "CTRLModel"),
    "openai-gpt": ("openai", "OpenAIGPTModel"),
    "xlm": ("xlm", "XLMModelStandalone"),
    "gpt_neox": ("gpt_neox", "GPTNeoXModelStandalone"),
    "gptj": ("gptj", "GPTJModelStandalone"),
    "falcon": ("falcon", "FalconModelStandalone"),
    "deepseek_v3": ("deepseek_v3", "DeepseekV3ModelStandalone"),
    "gpt_oss": ("gpt_oss", "GptOssModelStandalone"),
    "opt": ("opt", "OPTModelStandalone"),
    "cohere": ("cohere", "CohereModelStandalone"),
    "granite": ("granite", "GraniteModelStandalone"),
    "mixtral": ("mixtral", "MixtralModelStandalone"),
    "bert": ("bert", "BertModelStandalone"),
    "bert-generation": ("bert_generation", "BertGenerationEncoder"),
    "roberta-prelayernorm": ("roberta_prelayernorm", "RobertaPreLayerNormModelStandalone"),
    "splinter": ("splinter", "SplinterModelStandalone"),
    "dpr": ("dpr", "DPRQuestionEncoder"),
    "roberta": ("roberta", "RobertaModelStandalone"),
    "mpnet": ("mpnet", "MPNetModelStandalone"),
    "camembert": ("camembert", "CamembertModelStandalone"),
    "xlm-roberta": ("xlm_roberta", "XLMRobertaModelStandalone"),
    "flaubert": ("flaubert", "FlaubertModelStandalone"),
    "xlnet": ("xlnet", "XLNetModelStandalone"),
    "squeezebert": ("squeezebert", "SqueezeBertModelStandalone"),
    "convbert": ("convbert", "ConvBertModelStandalone"),
    "mobilebert": ("mobilebert", "MobileBertModelStandalone"),
    "distilbert": ("distilbert", "DistilBertModelStandalone"),
    "electra": ("electra", "ElectraModelStandalone"),
    "albert": ("albert", "AlbertModelStandalone"),
    "modernbert": ("modernbert", "ModernBertModelStandalone"),
    "resnet": ("resnet", "ResNetModelStandalone"),
    "detr": ("detr", "DetrModelStandalone"),
    "deformable_detr": ("deformable_detr", "DeformableDetrModelStandalone"),
    "convnext": ("convnext", "ConvNextModelStandalone"),
    "convnextv2": ("convnextv2", "ConvNextV2ModelStandalone"),
    "cpmant": ("cpmant", "CpmAntModelStandalone"),
    "swin": ("swin", "SwinModelStandalone"),
    "donut-swin": ("donut", "DonutSwinModel"),
    "deit": ("deit", "DeiTModelStandalone"),
    "dinov2": ("dinov2", "Dinov2ModelStandalone"),
    "dinov2_with_registers": ("dinov2_with_registers", "Dinov2WithRegistersModelStandalone"),
    "mobilenet_v1": ("mobilenet_v1", "MobileNetV1ModelStandalone"),
    "swiftformer": ("swiftformer", "SwiftFormerModelStandalone"),
    "textnet": ("textnet", "TextNetModelStandalone"),
    "hgnet_v2": ("hgnet_v2", "HGNetV2Backbone"),
    "pvt_v2": ("pvt_v2", "PvtV2ModelStandalone"),
    "vitpose_backbone": ("vitpose_backbone", "VitPoseBackboneStandalone"),
    "vitpose": ("vitpose", "VitPoseForPoseEstimation"),
    "segformer": ("segformer", "SegformerModelStandalone"),
    "glpn": ("glpn", "GLPNModelStandalone"),
    "videomae": ("videomae", "VideoMAEModelStandalone"),
    "timesformer": ("timesformer", "TimesformerModel"),
    "vit_mae": ("vit_mae", "ViTMAEModel"),
    "owlvit": ("owlvit", "OwlViTModelStandalone"),
    "blip": ("blip", "BlipModel"),
    "wav2vec2": ("wav2vec2", "Wav2Vec2ModelStandalone"),
    "wav2vec2-conformer": ("wav2vec2_conformer", "Wav2Vec2ConformerModelStandalone"),
    "wav2vec2-bert": ("wav2vec2_bert", "Wav2Vec2BertModelStandalone"),
    "seamless_m4t": ("seamless_m4t", "SeamlessM4TModel"),
    "seamless_m4t_v2": ("seamless_m4t_v2", "SeamlessM4Tv2ForSpeechToText"),
    "hubert": ("hubert", "HubertModelStandalone"),
    "wavlm": ("wavlm", "WavLMModelStandalone"),
    "mamba": ("mamba", "MambaModelStandalone"),
    "falcon_mamba": ("falcon_mamba", "FalconMambaModelStandalone"),
    "mamba2": ("mamba2", "Mamba2ModelStandalone"),
    "lfm2": ("lfm2", "Lfm2ModelStandalone"),
    "bamba": ("bamba", "BambaModelStandalone"),
    "jamba": ("jamba", "JambaModelStandalone"),
    "zamba": ("zamba", "ZambaModelStandalone"),
    "zamba2": ("zamba2", "Zamba2ModelStandalone"),
    "dac": ("dac", "DacModel"),
    "xcodec": ("xcodec", "XcodecModel"),
    "reformer": ("reformer", "ReformerModel"),
    "ministral3": ("ministral3", "Ministral3ModelStandalone"),
    "hyperclovax": ("hyperclovax", "HyperCLOVAXModelStandalone"),
    "nanochat": ("nanochat", "NanoChatModelStandalone"),
    "eurobert": ("eurobert", "EuroBertModelStandalone"),
    "parakeet_encoder": ("parakeet", "ParakeetEncoder"),
    "parakeet_ctc": ("parakeet", "ParakeetForCTC"),
    "parakeet_rnnt": ("parakeet", "ParakeetForRNNT"),
    "parakeet_tdt": ("parakeet", "ParakeetForTDT"),
    "deepseek_vl": ("deepseek_vl", "DeepseekVLForConditionalGeneration"),
    "vjepa2": ("vjepa2", "VJEPA2Model"),
    "rt_detr": ("rt_detr", "RTDetrModel"),
    "perceiver": ("perceiver", "PerceiverModel"),
    "rt_detr_v2": ("rt_detr_v2", "RTDetrV2Model"),
    "layoutlmv3": ("layoutlmv3", "LayoutLMv3Model"),
    "nemotron_h": ("nemotron_h", "NemotronHModelStandalone"),
    "cwm": ("cwm", "CwmModelStandalone"),
    "minicpm3": ("minicpm3", "MiniCPM3ModelStandalone"),
    "minimax_m2": ("minimax_m2", "MiniMaxM2ModelStandalone"),
    "glm4_moe_lite": ("glm4_moe_lite", "Glm4MoeLiteModelStandalone"),
    "youtu": ("youtu", "YoutuModelStandalone"),
    "exaone_moe": ("exaone_moe", "ExaoneMoeModelStandalone"),
    "lfm2_moe": ("lfm2_moe", "Lfm2MoeModelStandalone"),
    "jais2": ("jais2", "Jais2ModelStandalone"),
    "solar_open": ("solar_open", "SolarOpenModelStandalone"),
    "granite_swa": ("granite_swa", "GraniteSWAModelStandalone"),
    "granitemoehybrid": ("granitemoehybrid", "GraniteMoeHybridModelStandalone"),
    "falcon_h1": ("falcon_h1", "FalconH1ModelStandalone"),
    "gpt_bigcode": ("gpt_bigcode", "GPTBigCodeModelStandalone"),
    "biogpt": ("biogpt", "BioGptModelStandalone"),
    "cohere2": ("cohere2", "Cohere2ModelStandalone"),
    "cohere2_moe": ("cohere2_moe", "Cohere2MoeModelStandalone"),
    "granitemoe_swa": ("granitemoe_swa", "GraniteMoeSWAModelStandalone"),
    "phimoe": ("phimoe", "PhimoeModelStandalone"),
    "glm4_moe": ("glm4_moe", "Glm4MoeModelStandalone"),
    "beit": ("beit", "BeitModelStandalone"),
    "mobilenet_v2": ("mobilenet_v2", "MobileNetV2ModelStandalone"),
    "mobilevit": ("mobilevit", "MobileViTModelStandalone"),
    "mobilevitv2": ("mobilevitv2", "MobileViTV2ModelStandalone"),
    "levit": ("levit", "LevitModelStandalone"),
    "poolformer": ("poolformer", "PoolFormerModelStandalone"),
    "bit": ("bit", "BitModelStandalone"),
    "pvt": ("pvt", "PvtModelStandalone"),
    "swinv2": ("swinv2", "Swinv2ModelStandalone"),
    "cvt": ("cvt", "CvtModelStandalone"),
    "regnet": ("regnet", "RegNetModelStandalone"),
    "efficientnet": ("efficientnet", "EfficientNetModelStandalone"),
    "xglm": ("xglm", "XGLMModelStandalone"),
    "ernie": ("ernie", "ErnieModelStandalone"),
    "unispeech": ("unispeech", "UniSpeechModelStandalone"),
    "unispeech-sat": ("unispeech_sat", "UniSpeechSatModelStandalone"),
    "data2vec-audio": ("data2vec", "Data2VecAudioModelStandalone"),
    "sew": ("sew", "SEWModelStandalone"),
    "sew-d": ("sew_d", "SEWDModelStandalone"),
    "longformer": ("longformer", "LongformerModelStandalone"),
    "big_bird": ("big_bird", "BigBirdModelStandalone"),
    "esm": ("esm", "EsmModelStandalone"),
    "roformer": ("roformer", "RoFormerModelStandalone"),
    "fnet": ("fnet", "FNetModelStandalone"),
    "rembert": ("rembert", "RemBertModelStandalone"),
    "megatron-bert": ("megatron_bert", "MegatronBertModelStandalone"),
    "vit": ("vit", "ViTModelStandalone"),
    "audio-spectrogram-transformer": ("audio_spectrogram_transformer", "ASTModel"),
    "ijepa": ("ijepa", "IJepaModelStandalone"),
    "vit_msn": ("vit_msn", "ViTMSNModelStandalone"),
    "vivit": ("vivit", "VivitModel"),
    "align": ("align", "AlignModel"),
    "altclip": ("altclip", "AltCLIPModel"),
    "chinese_clip": ("chinese_clip", "ChineseCLIPModel"),
    "clip": ("clip", "CLIPModel"),
    "metaclip_2": ("metaclip_2", "MetaClip2Model"),
    "colpali": ("colpali", "ColPaliForRetrieval"),
    "colqwen2": ("colqwen2", "ColQwen2ForRetrieval"),
    "groupvit": ("groupvit", "GroupViTModel"),
    "xclip": ("x_clip", "XCLIPModel"),
    "siglip": ("siglip", "SiglipModel"),
    "siglip2": ("siglip2", "Siglip2Model"),
    "siglip2_vision_model": ("siglip2", "Siglip2VisionModel"),
    "pixtral": ("pixtral", "PixtralVisionModel"),
    "siglip_vision_model": ("siglip", "SiglipVisionModel"),
    "whisper": ("whisper", "WhisperModelStandalone"),
    "luke": ("luke", "LukeModelStandalone"),
    "hiera": ("hiera", "HieraModel"),
    "conditional_detr": ("conditional_detr", "ConditionalDetrModelStandalone"),
    "dab-detr": ("dab_detr", "DabDetrModelStandalone"),
    "vitdet": ("vitdet", "VitDetModel"),
    "vitmatte": ("vitmatte", "VitMatteForImageMatting"),
    "upernet": ("upernet", "UperNetForSemanticSegmentation"),
    "seggpt": ("seggpt", "SegGptForImageSegmentation"),
    "zoedepth": ("zoedepth", "ZoeDepthForDepthEstimation"),
    "prompt_depth_anything": ("prompt_depth_anything", "PromptDepthAnythingForDepthEstimation"),
    "flava": ("flava", "FlavaModel"),
    "dinov3_vit": ("dinov3_vit", "DINOv3ViTModel"),
    "mgp-str": ("mgp_str", "MgpstrForSceneTextRecognition"),
    "focalnet": ("focalnet", "FocalNetModel"),
    "aimv2": ("aimv2", "Aimv2Model"),
    "bros": ("bros", "BrosModel"),
    "clipseg": ("clipseg", "CLIPSegForImageSegmentation"),
    "maskformer": ("maskformer", "MaskFormerForInstanceSegmentation"),
    "mask2former": ("mask2former", "Mask2FormerForUniversalSegmentation"),
    "bridgetower": ("bridgetower", "BridgeTowerModel"),
    "udop": ("udop", "UdopForConditionalGeneration"),
    "d_fine": ("d_fine", "DFineForObjectDetection"),
    "aimv2_vision_model": ("aimv2", "Aimv2VisionModel"),
    "dinov3_convnext": ("dinov3_convnext", "DINOv3ConvNextModel"),
    "longt5": ("longt5", "LongT5EncoderModel"),
    "t5": ("t5", "T5EncoderModel"),
    "mt5": ("t5", "T5EncoderModel"),
    "umt5": ("umt5", "UMT5EncoderModel"),
    "switch_transformers": ("switch_transformers", "SwitchTransformersEncoderModel"),
    "olmo2": ("olmo2", "Olmo2ModelStandalone"),
    "olmo3": ("olmo3", "Olmo3ModelStandalone"),
    "vaultgemma": ("vaultgemma", "VaultGemmaModelStandalone"),
    "ministral": ("ministral", "MinistralModelStandalone"),
    "bitnet": ("bitnet", "BitNetModelStandalone"),
    "apertus": ("apertus", "ApertusModelStandalone"),
    "granitemoeshared": ("granitemoeshared", "GraniteMoeSharedModelStandalone"),
    "flex_olmo": ("flex_olmo", "FlexOlmoModelStandalone"),
    "hunyuan_v1_dense": ("hunyuan_v1_dense", "HunYuanDenseV1ModelStandalone"),
    "hunyuan_v1_moe": ("hunyuan_v1_moe", "HunYuanMoEV1ModelStandalone"),
    "modernbert-decoder": ("modernbert_decoder", "ModernBertDecoderModelStandalone"),
    "gpt_neox_japanese": ("gpt_neox_japanese", "GPTNeoXJapaneseModelStandalone"),
    "doge": ("doge", "DogeModelStandalone"),
    "imagegpt": ("imagegpt", "ImageGPTModelStandalone"),
    "visual_bert": ("visual_bert", "VisualBertModelStandalone"),
    "vilt": ("vilt", "ViltModelStandalone"),
    "lxmert": ("lxmert", "LxmertModelStandalone"),
    "markuplm": ("markuplm", "MarkupLMModelStandalone"),
    "lilt": ("lilt", "LiltModelStandalone"),
    "fsmt": ("fsmt", "FSMTForConditionalGeneration"),
    "decision_transformer": ("decision_transformer", "DecisionTransformerModel"),
    "minimax": ("minimax", "MiniMaxModelStandalone"),
    "diffllama": ("diffllama", "DiffLlamaModelStandalone"),
    "dots1": ("dots1", "Dots1ModelStandalone"),
    "deepseek_v2": ("deepseek_v2", "DeepseekV2ModelStandalone"),
    "llama4_text": ("llama4", "Llama4TextModelStandalone"),
    "emu3_text_model": ("emu3", "Emu3TextModelStandalone"),
    "emu3": ("emu3", "Emu3ForConditionalGeneration"),
    "ernie4_5_moe": ("ernie4_5_moe", "Ernie4_5_MoeModelStandalone"),
    "starcoder2": ("starcoder2", "Starcoder2ModelStandalone"),
    "stablelm": ("stablelm", "StableLmModelStandalone"),
    "phi": ("phi", "PhiModelStandalone"),
    "qwen2_moe": ("qwen2_moe", "Qwen2MoeModelStandalone"),
    "gemma3_text": ("gemma3", "Gemma3TextModelStandalone"),
    "smollm3": ("smollm3", "SmolLM3ModelStandalone"),
    "qwen3_moe": ("qwen3_moe", "Qwen3MoeModelStandalone"),
    "laguna": ("laguna", "LagunaModelStandalone"),
    "deepseek_v32": ("deepseek_v32", "DeepseekV32ModelStandalone"),
    "mellum": ("mellum", "MellumModelStandalone"),
    "mistral4": ("mistral4", "Mistral4ModelStandalone"),
    "swin2sr": ("swin2sr", "Swin2SRForImageSuperResolution"),
    "t5gemma": ("t5gemma", "T5GemmaForConditionalGeneration"),
    "video_llava": ("video_llava", "VideoLlavaForConditionalGeneration"),
    "sam_hq": ("sam_hq", "SamHQModel"),
    "grounding-dino": ("grounding_dino", "GroundingDinoForObjectDetection"),
    "mm-grounding-dino": ("mm_grounding_dino", "MMGroundingDinoForObjectDetection"),
    "instructblipvideo": ("instructblipvideo", "InstructBlipVideoForConditionalGeneration"),
    "florence2": ("florence2", "Florence2ForConditionalGeneration"),
    "idefics": ("idefics", "IdeficsForVisionText2Text"),
    "kosmos-2.5": ("kosmos2_5", "Kosmos2_5ForConditionalGeneration"),
    "granite_speech": ("granite_speech", "GraniteSpeechForConditionalGeneration"),
    "csm": ("csm", "CsmForConditionalGeneration"),
    "dia": ("dia", "DiaForConditionalGeneration"),
    "qwen2_5_omni": ("qwen2_5_omni", "Qwen2_5OmniForConditionalGeneration"),
    "qwen2_5_omni_thinker": ("qwen2_5_omni", "Qwen2_5OmniThinkerForConditionalGeneration"),
    "kyutai_speech_to_text": ("kyutai_speech_to_text", "KyutaiSpeechToTextForConditionalGeneration"),
    "axk1": ("axk1", "AXK1ModelStandalone"),
    "afmoe": ("afmoe", "AfmoeModelStandalone"),
    "olmo_hybrid": ("olmo_hybrid", "OlmoHybridModelStandalone"),
    "jina_embeddings_v3": ("jina_embeddings_v3", "JinaEmbeddingsV3ModelStandalone"),
    "nomic_bert": ("nomic_bert", "NomicBertModelStandalone"),
    "axk2": ("axk2", "AXK2ModelStandalone"),
    "hy_v3": ("hy_v3", "HYV3ModelStandalone"),
    "qwen3_5": ("qwen3_5", "Qwen3_5ModelStandalone"),
    "qwen3_5_moe": ("qwen3_5_moe", "Qwen3_5MoeModelStandalone"),
    "qwen3_next": ("qwen3_next", "Qwen3NextModelStandalone"),
    "glm": ("glm", "GlmModelStandalone"),
    "glm4": ("glm4", "Glm4ModelStandalone"),
    "nemotron": ("nemotron", "NemotronModelStandalone"),
    "persimmon": ("persimmon", "PersimmonModelStandalone"),
    "bloom": ("bloom", "BloomModelStandalone"),
    "mpt": ("mpt", "MptModelStandalone"),
    "gpt_neo": ("gpt_neo", "GPTNeoModelStandalone"),
    "codegen": ("codegen", "CodeGenModelStandalone"),
    "layoutlm": ("layoutlm", "LayoutLMModelStandalone"),
    "sam": ("sam", "SamModel"),
    "sam2": ("sam2", "Sam2Model"),
    "superpoint": ("superpoint", "SuperPointForKeypointDetection"),
    "vits": ("vits", "VitsModel"),
    "bark": ("bark", "BarkModel"),
    "musicgen": ("musicgen", "MusicgenForConditionalGeneration"),
    "musicgen_melody": ("musicgen_melody", "MusicgenMelodyForConditionalGeneration"),
    "qwen2_audio": ("qwen2_audio", "Qwen2AudioForConditionalGeneration"),
    "voxtral": ("voxtral", "VoxtralForConditionalGeneration"),
    "clap": ("clap", "ClapModel"),
    "encodec": ("encodec", "EncodecModel"),
    "mimi": ("mimi", "MimiModel"),
    "moshi": ("moshi", "MoshiModelStandalone"),
    "deberta-v2": ("deberta_v2", "DebertaV2ModelStandalone"),
    "deberta": ("deberta", "DebertaModelStandalone"),
    "ibert": ("ibert", "IBertModelStandalone"),
    "xlm-roberta-xl": ("xlm_roberta_xl", "XLMRobertaXLModelStandalone"),
    "nystromformer": ("nystromformer", "NystromformerModelStandalone"),
    "yoso": ("yoso", "YosoModelStandalone"),
    "xmod": ("xmod", "XmodModelStandalone"),
    "roc_bert": ("roc_bert", "RoCBertModelStandalone"),
    "olmo": ("olmo", "OlmoModelStandalone"),
    "olmoe": ("olmoe", "OlmoeModelStandalone"),
    "dbrx": ("dbrx", "DbrxModelStandalone"),
    "helium": ("helium", "HeliumModelStandalone"),
    "arcee": ("arcee", "ArceeModelStandalone"),
    "ernie4_5": ("ernie4_5", "Ernie4_5ModelStandalone"),
    "exaone4": ("exaone4", "Exaone4ModelStandalone"),
    "seed_oss": ("seed_oss", "SeedOssModelStandalone"),
    "granitemoe": ("granitemoe", "GraniteMoeModelStandalone"),
    "vision-encoder-decoder": ("vision_encoder_decoder", "VisionEncoderDecoderModel"),
    "encoder-decoder": ("encoder_decoder", "EncoderDecoderModel"),
    "speech-encoder-decoder": ("speech_encoder_decoder", "SpeechEncoderDecoderModel"),
    "vision-text-dual-encoder": ("vision_text_dual_encoder", "VisionTextDualEncoderModel"),
    "superglue": ("superglue", "SuperGlueForKeypointMatching"),
    "sam_vision_model": ("sam", "SamVisionModel"),
}
MODEL_FOR_CAUSAL_LM_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "glm_moe_dsa": ("glm_moe_dsa", "GlmMoeDsaForCausalLM"),
    "longcat_flash": ("longcat_flash", "LongcatFlashForCausalLM"),
    "univnet": ("univnet", "UnivNetModel"),
    "pop2piano": ("pop2piano", "Pop2PianoForConditionalGeneration"),
    "rag": ("rag", "RagTokenForGeneration"),
    "tvp": ("tvp", "TvpForVideoGrounding"),
    "llama": ("llama", "LlamaForCausalLM"),
    "jetmoe": ("jetmoe", "JetMoeForCausalLM"),
    "mistral": ("mistral", "MistralForCausalLM"),
    "ministral3": ("ministral3", "Ministral3ForCausalLM"),
    "cohere2_moe": ("cohere2_moe", "Cohere2MoeForCausalLM"),
    "granitemoe_swa": ("granitemoe_swa", "GraniteMoeSWAForCausalLM"),
    "hyperclovax": ("hyperclovax", "HyperCLOVAXForCausalLM"),
    "nanochat": ("nanochat", "NanoChatForCausalLM"),
    "qwen2": ("qwen2", "Qwen2ForCausalLM"),
    "qwen3": ("qwen3", "Qwen3ForCausalLM"),
    "gemma": ("gemma", "GemmaForCausalLM"),
    "gemma2": ("gemma2", "Gemma2ForCausalLM"),
    "phi3": ("phi3", "Phi3ForCausalLM"),
    "gpt2": ("gpt2", "GPT2LMHeadModel"),
    "ctrl": ("ctrl", "CTRLLMHeadModel"),
    "openai-gpt": ("openai", "OpenAIGPTLMHeadModel"),
    "gpt_neox": ("gpt_neox", "GPTNeoXForCausalLM"),
    "gptj": ("gptj", "GPTJForCausalLM"),
    "falcon": ("falcon", "FalconForCausalLM"),
    "deepseek_v3": ("deepseek_v3", "DeepseekV3ForCausalLM"),
    "gpt_oss": ("gpt_oss", "GptOssForCausalLM"),
    "opt": ("opt", "OPTForCausalLM"),
    "mamba": ("mamba", "MambaForCausalLM"),
    "falcon_mamba": ("falcon_mamba", "FalconMambaForCausalLM"),
    "mamba2": ("mamba2", "Mamba2ForCausalLM"),
    "lfm2": ("lfm2", "Lfm2ForCausalLM"),
    "bamba": ("bamba", "BambaForCausalLM"),
    "jamba": ("jamba", "JambaForCausalLM"),
    "zamba": ("zamba", "ZambaForCausalLM"),
    "zamba2": ("zamba2", "Zamba2ForCausalLM"),
    "nemotron_h": ("nemotron_h", "NemotronHForCausalLM"),
    "cwm": ("cwm", "CwmForCausalLM"),
    "minicpm3": ("minicpm3", "MiniCPM3ForCausalLM"),
    "minimax_m2": ("minimax_m2", "MiniMaxM2ForCausalLM"),
    "glm4_moe_lite": ("glm4_moe_lite", "Glm4MoeLiteForCausalLM"),
    "youtu": ("youtu", "YoutuForCausalLM"),
    "exaone_moe": ("exaone_moe", "ExaoneMoeForCausalLM"),
    "lfm2_moe": ("lfm2_moe", "Lfm2MoeForCausalLM"),
    "jais2": ("jais2", "Jais2ForCausalLM"),
    "solar_open": ("solar_open", "SolarOpenForCausalLM"),
    "granite_swa": ("granite_swa", "GraniteSWAForCausalLM"),
    "granitemoehybrid": ("granitemoehybrid", "GraniteMoeHybridForCausalLM"),
    "falcon_h1": ("falcon_h1", "FalconH1ForCausalLM"),
    "gpt_bigcode": ("gpt_bigcode", "GPTBigCodeForCausalLM"),
    "biogpt": ("biogpt", "BioGptForCausalLM"),
    "cohere2": ("cohere2", "Cohere2ForCausalLM"),
    "phimoe": ("phimoe", "PhimoeForCausalLM"),
    "glm4_moe": ("glm4_moe", "Glm4MoeForCausalLM"),
    "xglm": ("xglm", "XGLMForCausalLM"),
    "cohere": ("cohere", "CohereForCausalLM"),
    "cpmant": ("cpmant", "CpmAntForCausalLM"),
    "granite": ("granite", "GraniteForCausalLM"),
    "mixtral": ("mixtral", "MixtralForCausalLM"),
    "olmo2": ("olmo2", "Olmo2ForCausalLM"),
    "olmo3": ("olmo3", "Olmo3ForCausalLM"),
    "vaultgemma": ("vaultgemma", "VaultGemmaForCausalLM"),
    "ministral": ("ministral", "MinistralForCausalLM"),
    "bitnet": ("bitnet", "BitNetForCausalLM"),
    "apertus": ("apertus", "ApertusForCausalLM"),
    "granitemoeshared": ("granitemoeshared", "GraniteMoeSharedForCausalLM"),
    "flex_olmo": ("flex_olmo", "FlexOlmoForCausalLM"),
    "hunyuan_v1_dense": ("hunyuan_v1_dense", "HunYuanDenseV1ForCausalLM"),
    "hunyuan_v1_moe": ("hunyuan_v1_moe", "HunYuanMoEV1ForCausalLM"),
    "modernbert-decoder": ("modernbert_decoder", "ModernBertDecoderForCausalLM"),
    "gpt_neox_japanese": ("gpt_neox_japanese", "GPTNeoXJapaneseForCausalLM"),
    "doge": ("doge", "DogeForCausalLM"),
    "minimax": ("minimax", "MiniMaxForCausalLM"),
    "diffllama": ("diffllama", "DiffLlamaForCausalLM"),
    "dots1": ("dots1", "Dots1ForCausalLM"),
    "deepseek_v2": ("deepseek_v2", "DeepseekV2ForCausalLM"),
    "llama4_text": ("llama4", "Llama4ForCausalLM"),
    "emu3_text_model": ("emu3", "Emu3ForCausalLM"),
    "ernie4_5_moe": ("ernie4_5_moe", "Ernie4_5_MoeForCausalLM"),
    "starcoder2": ("starcoder2", "Starcoder2ForCausalLM"),
    "stablelm": ("stablelm", "StableLmForCausalLM"),
    "phi": ("phi", "PhiForCausalLM"),
    "qwen2_moe": ("qwen2_moe", "Qwen2MoeForCausalLM"),
    "gemma3_text": ("gemma3", "Gemma3ForCausalLM"),
    "gemma3n_text": ("gemma3n", "Gemma3nForCausalLM"),
    "smollm3": ("smollm3", "SmolLM3ForCausalLM"),
    "qwen3_moe": ("qwen3_moe", "Qwen3MoeForCausalLM"),
    "laguna": ("laguna", "LagunaForCausalLM"),
    "deepseek_v32": ("deepseek_v32", "DeepseekV32ForCausalLM"),
    "mellum": ("mellum", "MellumForCausalLM"),
    "mistral4": ("mistral4", "Mistral4ForCausalLM"),
    "axk1": ("axk1", "AXK1ForCausalLM"),
    "afmoe": ("afmoe", "AfmoeForCausalLM"),
    "olmo_hybrid": ("olmo_hybrid", "OlmoHybridForCausalLM"),
    "axk2": ("axk2", "AXK2ForCausalLM"),
    "hy_v3": ("hy_v3", "HYV3ForCausalLM"),
    "qwen3_5": ("qwen3_5", "Qwen3_5ForCausalLM"),
    "qwen3_5_moe": ("qwen3_5_moe", "Qwen3_5MoeForCausalLM"),
    "qwen3_next": ("qwen3_next", "Qwen3NextForCausalLM"),
    "moshi": ("moshi", "MoshiForCausalLM"),
    "glm": ("glm", "GlmForCausalLM"),
    "glm4": ("glm4", "Glm4ForCausalLM"),
    "nemotron": ("nemotron", "NemotronForCausalLM"),
    "persimmon": ("persimmon", "PersimmonForCausalLM"),
    "fuyu": ("fuyu", "FuyuForCausalLM"),
    "kosmos-2": ("kosmos2", "Kosmos2ForConditionalGeneration"),
    "recurrent_gemma": ("recurrent_gemma", "RecurrentGemmaForCausalLM"),
    "rwkv": ("rwkv", "RwkvForCausalLM"),
    "bloom": ("bloom", "BloomForCausalLM"),
    "mpt": ("mpt", "MptForCausalLM"),
    "gpt_neo": ("gpt_neo", "GPTNeoForCausalLM"),
    "codegen": ("codegen", "CodeGenForCausalLM"),
    "olmo": ("olmo", "OlmoForCausalLM"),
    "olmoe": ("olmoe", "OlmoeForCausalLM"),
    "dbrx": ("dbrx", "DbrxForCausalLM"),
    "helium": ("helium", "HeliumForCausalLM"),
    "arcee": ("arcee", "ArceeForCausalLM"),
    "ernie4_5": ("ernie4_5", "Ernie4_5ForCausalLM"),
    "exaone4": ("exaone4", "Exaone4ForCausalLM"),
    "seed_oss": ("seed_oss", "SeedOssForCausalLM"),
    "granitemoe": ("granitemoe", "GraniteMoeForCausalLM"),
}
MODEL_FOR_SEQUENCE_CLASSIFICATION_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "funnel": ("funnel", "FunnelForSequenceClassification"),
    "canine": ("canine", "CanineForSequenceClassification"),
    "tapas": ("tapas", "TapasForSequenceClassification"),
    "bart": ("bart", "BartForSequenceClassification"),
    "mvp": ("mvp", "MvpForSequenceClassification"),
    "llama": ("llama", "LlamaForSequenceClassification"),
    "mistral": ("mistral", "MistralForSequenceClassification"),
    "qwen2": ("qwen2", "Qwen2ForSequenceClassification"),
    "bert": ("bert", "BertForSequenceClassification"),
    "roberta": ("roberta", "RobertaForSequenceClassification"),
    "xlnet": ("xlnet", "XLNetForSequenceClassification"),
    "squeezebert": ("squeezebert", "SqueezeBertForSequenceClassification"),
    "convbert": ("convbert", "ConvBertForSequenceClassification"),
    "mobilebert": ("mobilebert", "MobileBertForSequenceClassification"),
    "xlm-roberta": ("roberta", "RobertaForSequenceClassification"),
    "camembert": ("roberta", "RobertaForSequenceClassification"),
    "distilbert": ("distilbert", "DistilBertForSequenceClassification"),
    "electra": ("electra", "ElectraForSequenceClassification"),
    "albert": ("albert", "AlbertForSequenceClassification"),
    "modernbert": ("modernbert", "ModernBertForSequenceClassification"),
    "wav2vec2": ("wav2vec2", "Wav2Vec2ForSequenceClassification"),
    "layoutlm": ("layoutlm", "LayoutLMForSequenceClassification"),
    "deberta-v2": ("deberta_v2", "DebertaV2ForSequenceClassification"),
    "deberta": ("deberta", "DebertaForSequenceClassification"),
    "ibert": ("ibert", "IBertForSequenceClassification"),
    "xlm-roberta-xl": ("xlm_roberta_xl", "XLMRobertaXLForSequenceClassification"),
    "nystromformer": ("nystromformer", "NystromformerForSequenceClassification"),
    "yoso": ("yoso", "YosoForSequenceClassification"),
    "xmod": ("xmod", "XmodForSequenceClassification"),
    "roc_bert": ("roc_bert", "RoCBertForSequenceClassification"),
    "markuplm": ("markuplm", "MarkupLMForSequenceClassification"),
    "lilt": ("lilt", "LiltForSequenceClassification"),
}
MODEL_FOR_TOKEN_CLASSIFICATION_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "funnel": ("funnel", "FunnelForTokenClassification"),
    "canine": ("canine", "CanineForTokenClassification"),
    "llama": ("llama", "LlamaForTokenClassification"),
    "mistral": ("mistral", "MistralForTokenClassification"),
    "qwen2": ("qwen2", "Qwen2ForTokenClassification"),
    "bert": ("bert", "BertForTokenClassification"),
    "electra": ("electra", "ElectraForTokenClassification"),
    "modernbert": ("modernbert", "ModernBertForTokenClassification"),
    "roberta": ("roberta", "RobertaForTokenClassification"),
    "xlnet": ("xlnet", "XLNetForTokenClassification"),
    "squeezebert": ("squeezebert", "SqueezeBertForTokenClassification"),
    "xlm-roberta": ("roberta", "RobertaForTokenClassification"),
    "camembert": ("roberta", "RobertaForTokenClassification"),
    "layoutlm": ("layoutlm", "LayoutLMForTokenClassification"),
    "deberta-v2": ("deberta_v2", "DebertaV2ForTokenClassification"),
    "deberta": ("deberta", "DebertaForTokenClassification"),
    "markuplm": ("markuplm", "MarkupLMForTokenClassification"),
    "lilt": ("lilt", "LiltForTokenClassification"),
}
MODEL_FOR_QUESTION_ANSWERING_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "splinter": ("splinter", "SplinterForQuestionAnswering"),
    "funnel": ("funnel", "FunnelForQuestionAnswering"),
    "canine": ("canine", "CanineForQuestionAnswering"),
    "bart": ("bart", "BartForQuestionAnswering"),
    "mvp": ("mvp", "MvpForQuestionAnswering"),
    "llama": ("llama", "LlamaForQuestionAnswering"),
    "mistral": ("mistral", "MistralForQuestionAnswering"),
    "qwen2": ("qwen2", "Qwen2ForQuestionAnswering"),
    "bert": ("bert", "BertForQuestionAnswering"),
    "roberta": ("roberta", "RobertaForQuestionAnswering"),
    "xlnet": ("xlnet", "XLNetForQuestionAnsweringSimple"),
    "squeezebert": ("squeezebert", "SqueezeBertForQuestionAnswering"),
    "mobilebert": ("mobilebert", "MobileBertForQuestionAnswering"),
    "xlm-roberta": ("roberta", "RobertaForQuestionAnswering"),
    "camembert": ("roberta", "RobertaForQuestionAnswering"),
    "distilbert": ("distilbert", "DistilBertForQuestionAnswering"),
    "deberta-v2": ("deberta_v2", "DebertaV2ForQuestionAnswering"),
    "deberta": ("deberta", "DebertaForQuestionAnswering"),
    "markuplm": ("markuplm", "MarkupLMForQuestionAnswering"),
    "lilt": ("lilt", "LiltForQuestionAnswering"),
}
MODEL_FOR_MASKED_LM_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "jina_embeddings_v3": ("jina_embeddings_v3", "JinaEmbeddingsV3ForMaskedLM"),
    "nomic_bert": ("nomic_bert", "NomicBertForMaskedLM"),
    "perceiver": ("perceiver", "PerceiverForMaskedLM"),
    "eurobert": ("eurobert", "EuroBertForMaskedLM"),
    "xlm": ("xlm", "XLMWithLMHeadModel"),
    "funnel": ("funnel", "FunnelForMaskedLM"),
    "tapas": ("tapas", "TapasForMaskedLM"),
    "bert": ("bert", "BertForMaskedLM"),
    "roberta": ("roberta", "RobertaForMaskedLM"),
    "mpnet": ("mpnet", "MPNetForMaskedLM"),
    "camembert": ("camembert", "CamembertForMaskedLM"),
    "xlm-roberta": ("xlm_roberta", "XLMRobertaForMaskedLM"),
    "flaubert": ("flaubert", "FlaubertWithLMHeadModel"),
    "roberta-prelayernorm": ("roberta_prelayernorm", "RobertaPreLayerNormForMaskedLM"),
    "squeezebert": ("squeezebert", "SqueezeBertForMaskedLM"),
    "convbert": ("convbert", "ConvBertForMaskedLM"),
    "mobilebert": ("mobilebert", "MobileBertForMaskedLM"),
    "distilbert": ("distilbert", "DistilBertForMaskedLM"),
    "electra": ("electra", "ElectraForMaskedLM"),
    "deberta-v2": ("deberta_v2", "DebertaV2ForMaskedLM"),
    "deberta": ("deberta", "DebertaForMaskedLM"),
    "ibert": ("ibert", "IBertForMaskedLM"),
    "xlm-roberta-xl": ("xlm_roberta_xl", "XLMRobertaXLForMaskedLM"),
    "nystromformer": ("nystromformer", "NystromformerForMaskedLM"),
    "yoso": ("yoso", "YosoForMaskedLM"),
    "xmod": ("xmod", "XmodForMaskedLM"),
    "roc_bert": ("roc_bert", "RoCBertForMaskedLM"),
    "albert": ("albert", "AlbertForMaskedLM"),
    "modernbert": ("modernbert", "ModernBertForMaskedLM"),
    "ernie": ("ernie", "ErnieForMaskedLM"),
    "roformer": ("roformer", "RoFormerForMaskedLM"),
    "fnet": ("fnet", "FNetForMaskedLM"),
    "rembert": ("rembert", "RemBertForMaskedLM"),
    "megatron-bert": ("megatron_bert", "MegatronBertForMaskedLM"),
    "longformer": ("longformer", "LongformerForMaskedLM"),
    "big_bird": ("big_bird", "BigBirdForMaskedLM"),
    "esm": ("esm", "EsmForMaskedLM"),
}
MODEL_FOR_IMAGE_CLASSIFICATION_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "hiera": ("hiera", "HieraForImageClassification"),
    "vit": ("vit", "ViTForImageClassification"),
    "ijepa": ("ijepa", "IJepaForImageClassification"),
    "vit_msn": ("vit_msn", "ViTMSNForImageClassification"),
    "resnet": ("resnet", "ResNetForImageClassification"),
    "convnext": ("convnext", "ConvNextForImageClassification"),
    "focalnet": ("focalnet", "FocalNetForImageClassification"),
    "convnextv2": ("convnextv2", "ConvNextV2ForImageClassification"),
    "swin": ("swin", "SwinForImageClassification"),
    "deit": ("deit", "DeiTForImageClassificationWithTeacher"),
    "dinov2": ("dinov2", "Dinov2ForImageClassification"),
    "dinov2_with_registers": ("dinov2_with_registers", "Dinov2WithRegistersForImageClassification"),
    "mobilenet_v1": ("mobilenet_v1", "MobileNetV1ForImageClassification"),
    "swiftformer": ("swiftformer", "SwiftFormerForImageClassification"),
    "textnet": ("textnet", "TextNetForImageClassification"),
    "hgnet_v2": ("hgnet_v2", "HGNetV2ForImageClassification"),
    "pvt_v2": ("pvt_v2", "PvtV2ForImageClassification"),
    "beit": ("beit", "BeitForImageClassification"),
    "mobilenet_v2": ("mobilenet_v2", "MobileNetV2ForImageClassification"),
    "mobilevit": ("mobilevit", "MobileViTForImageClassification"),
    "mobilevitv2": ("mobilevitv2", "MobileViTV2ForImageClassification"),
    "levit": ("levit", "LevitForImageClassification"),
    "poolformer": ("poolformer", "PoolFormerForImageClassification"),
    "bit": ("bit", "BitForImageClassification"),
    "pvt": ("pvt", "PvtForImageClassification"),
    "swinv2": ("swinv2", "Swinv2ForImageClassification"),
    "cvt": ("cvt", "CvtForImageClassification"),
    "regnet": ("regnet", "RegNetForImageClassification"),
    "efficientnet": ("efficientnet", "EfficientNetForImageClassification"),
    "segformer": ("segformer", "SegformerForImageClassification"),
}
MODEL_FOR_ZERO_SHOT_OBJECT_DETECTION_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "owlvit": ("owlvit", "OwlViTForObjectDetection"),
    "grounding-dino": ("grounding_dino", "GroundingDinoForObjectDetection"),
    "mm-grounding-dino": ("mm_grounding_dino", "MMGroundingDinoForObjectDetection"),
    "owlv2": ("owlv2", "Owlv2ForObjectDetection"),
}
MODEL_FOR_VIDEO_CLASSIFICATION_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "vjepa2": ("vjepa2", "VJEPA2ForVideoClassification"),
    "vivit": ("vivit", "VivitForVideoClassification"),
    "videomae": ("videomae", "VideoMAEForVideoClassification"),
    "timesformer": ("timesformer", "TimesformerForVideoClassification"),
}
MODEL_FOR_TIME_SERIES_PREDICTION_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "patchtst": ("patchtst", "PatchTSTForPrediction"),
    "time_series_transformer": ("time_series_transformer", "TimeSeriesTransformerForPrediction"),
    "informer": ("informer", "InformerForPrediction"),
    "autoformer": ("autoformer", "AutoformerForPrediction"),
    "timesfm": ("timesfm", "TimesFmModelForPrediction"),
    "timesfm_2_5": ("timesfm2_5", "TimesFm2_5ModelForPrediction"),
    "patchtsmixer": ("patchtsmixer", "PatchTSMixerForPrediction"),
}
MODEL_FOR_DEPTH_ESTIMATION_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "glpn": ("glpn", "GLPNForDepthEstimation"),
    "dpt": ("dpt", "DPTForDepthEstimation"),
    "depth_anything": ("depth_anything", "DepthAnythingForDepthEstimation"),
    "zoedepth": ("zoedepth", "ZoeDepthForDepthEstimation"),
    "prompt_depth_anything": ("prompt_depth_anything", "PromptDepthAnythingForDepthEstimation"),
}
MODEL_FOR_SEMANTIC_SEGMENTATION_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "mobilevit": ("mobilevit", "MobileViTForSemanticSegmentation"),
    "segformer": ("segformer", "SegformerForSemanticSegmentation"),
    "upernet": ("upernet", "UperNetForSemanticSegmentation"),
    "seggpt": ("seggpt", "SegGptForImageSegmentation"),
}
MODEL_FOR_OBJECT_DETECTION_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "conditional_detr": ("conditional_detr", "ConditionalDetrForObjectDetection"),
    "dab-detr": ("dab_detr", "DabDetrForObjectDetection"),
    "rt_detr": ("rt_detr", "RTDetrForObjectDetection"),
    "rt_detr_v2": ("rt_detr_v2", "RTDetrV2ForObjectDetection"),
    "d_fine": ("d_fine", "DFineForObjectDetection"),
    "detr": ("detr", "DetrForObjectDetection"),
    "deformable_detr": ("deformable_detr", "DeformableDetrForObjectDetection"),
    "table-transformer": ("table_transformer", "TableTransformerForObjectDetection"),
    "yolos": ("yolos", "YolosForObjectDetection"),
}
MODEL_FOR_AUDIO_CLASSIFICATION_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "audio-spectrogram-transformer": ("audio_spectrogram_transformer", "ASTForAudioClassification"),
    "wav2vec2": ("wav2vec2", "Wav2Vec2ForSequenceClassification"),
    "hubert": ("hubert", "HubertForSequenceClassification"),
    "wavlm": ("wavlm", "WavLMForSequenceClassification"),
}
MODEL_FOR_DOCUMENT_QUESTION_ANSWERING_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "layoutlm": ("layoutlm", "LayoutLMForQuestionAnswering"),
}
MODEL_FOR_CTC_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "wav2vec2": ("wav2vec2", "Wav2Vec2ForCTC"),
    "wav2vec2-conformer": ("wav2vec2_conformer", "Wav2Vec2ConformerForCTC"),
    "wav2vec2-bert": ("wav2vec2_bert", "Wav2Vec2BertForCTC"),
    "hubert": ("hubert", "HubertForCTC"),
    "wavlm": ("wavlm", "WavLMForCTC"),
    "parakeet_ctc": ("parakeet", "ParakeetForCTC"),
    "unispeech": ("unispeech", "UniSpeechForCTC"),
    "unispeech-sat": ("unispeech_sat", "UniSpeechSatForCTC"),
    "data2vec-audio": ("data2vec", "Data2VecAudioForCTC"),
    "sew": ("sew", "SEWForCTC"),
    "sew-d": ("sew_d", "SEWDForCTC"),
}
MODEL_FOR_SEQ_TO_SEQ_CAUSAL_LM_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "longt5": ("longt5", "LongT5ForConditionalGeneration"),
    "bigbird_pegasus": ("bigbird_pegasus", "BigBirdPegasusForConditionalGeneration"),
    "t5": ("t5", "T5ForConditionalGeneration"),
    "t5gemma": ("t5gemma", "T5GemmaForConditionalGeneration"),
    "mt5": ("mt5", "MT5ForConditionalGeneration"),
    "umt5": ("umt5", "UMT5ForConditionalGeneration"),
    "switch_transformers": ("switch_transformers", "SwitchTransformersForConditionalGeneration"),
    "bart": ("bart", "BartForConditionalGeneration"),
    "encoder-decoder": ("encoder_decoder", "EncoderDecoderModel"),
    "speech-encoder-decoder": ("speech_encoder_decoder", "SpeechEncoderDecoderModel"),
    "vision-text-dual-encoder": ("vision_text_dual_encoder", "VisionTextDualEncoderModel"),
    "mbart": ("mbart", "MBartForConditionalGeneration"),
    "mvp": ("mvp", "MvpForConditionalGeneration"),
    "pegasus_x": ("pegasus_x", "PegasusXForConditionalGeneration"),
    "pegasus": ("pegasus", "PegasusForConditionalGeneration"),
    "marian": ("marian", "MarianMTModel"),
    "m2m_100": ("m2m_100", "M2M100ForConditionalGeneration"),
    "nllb-moe": ("nllb_moe", "NllbMoeForConditionalGeneration"),
    "prophetnet": ("prophetnet", "ProphetNetForConditionalGeneration"),
    "fsmt": ("fsmt", "FSMTForConditionalGeneration"),
    "plbart": ("plbart", "PLBartForConditionalGeneration"),
    "blenderbot": ("blenderbot", "BlenderbotForConditionalGeneration"),
    "blenderbot-small": ("blenderbot_small", "BlenderbotSmallForConditionalGeneration"),
    "led": ("led", "LEDForConditionalGeneration"),
}
MODEL_FOR_SPEECH_SEQ_2_SEQ_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "moonshine_streaming": ("moonshine_streaming", "MoonshineStreamingForConditionalGeneration"),
    "moonshine": ("moonshine", "MoonshineForConditionalGeneration"),
    "whisper": ("whisper", "WhisperForConditionalGeneration"),
    "speech_to_text": ("speech_to_text", "Speech2TextForConditionalGeneration"),
    "speecht5": ("speecht5", "SpeechT5ForSpeechToText"),
}
MODEL_FOR_VISION_2_SEQ_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "kosmos-2.5": ("kosmos2_5", "Kosmos2_5ForConditionalGeneration"),
    "idefics": ("idefics", "IdeficsForVisionText2Text"),
    "llava": ("llava", "LlavaForConditionalGeneration"),
    "llama4": ("llama4", "Llama4ForConditionalGeneration"),
    "chameleon": ("chameleon", "ChameleonForConditionalGeneration"),
    "emu3": ("emu3", "Emu3ForConditionalGeneration"),
    "mllama": ("mllama", "MllamaForConditionalGeneration"),
    "idefics2": ("idefics2", "Idefics2ForConditionalGeneration"),
    "idefics3": ("idefics3", "Idefics3ForConditionalGeneration"),
    "mistral3": ("mistral3", "Mistral3ForConditionalGeneration"),
    "smolvlm": ("smolvlm", "SmolVLMForConditionalGeneration"),
    "blip": ("blip", "BlipForConditionalGeneration"),
    "vision-encoder-decoder": ("vision_encoder_decoder", "VisionEncoderDecoderModel"),
    "pix2struct": ("pix2struct", "Pix2StructForConditionalGeneration"),
}
MODEL_FOR_IMAGE_TEXT_TO_TEXT_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "florence2": ("florence2", "Florence2ForConditionalGeneration"),
    "got_ocr2": ("got_ocr2", "GotOcr2ForConditionalGeneration"),
    "deepseek_vl": ("deepseek_vl", "DeepseekVLForConditionalGeneration"),
    "vjepa2": ("vjepa2", "VJEPA2Model"),
    "rt_detr": ("rt_detr", "RTDetrModel"),
    "perceiver": ("perceiver", "PerceiverModel"),
    "rt_detr_v2": ("rt_detr_v2", "RTDetrV2Model"),
    "pix2struct": ("pix2struct", "Pix2StructForConditionalGeneration"),
    "llama4": ("llama4", "Llama4ForConditionalGeneration"),
    "chameleon": ("chameleon", "ChameleonForConditionalGeneration"),
    "emu3": ("emu3", "Emu3ForConditionalGeneration"),
    "mllama": ("mllama", "MllamaForConditionalGeneration"),
    "idefics2": ("idefics2", "Idefics2ForConditionalGeneration"),
    "idefics3": ("idefics3", "Idefics3ForConditionalGeneration"),
    "mistral3": ("mistral3", "Mistral3ForConditionalGeneration"),
    "smolvlm": ("smolvlm", "SmolVLMForConditionalGeneration"),
    "fuyu": ("fuyu", "FuyuForCausalLM"),
    "kosmos-2": ("kosmos2", "Kosmos2ForConditionalGeneration"),
    "llava": ("llava", "LlavaForConditionalGeneration"),
    "llava_next": ("llava_next", "LlavaNextForConditionalGeneration"),
    "llava_next_video": ("llava_next_video", "LlavaNextVideoForConditionalGeneration"),
    "llava_onevision": ("llava_onevision", "LlavaOnevisionForConditionalGeneration"),
    "aya_vision": ("aya_vision", "AyaVisionForConditionalGeneration"),
    "internvl": ("internvl", "InternVLForConditionalGeneration"),
    "vipllava": ("vipllava", "VipLlavaForConditionalGeneration"),
    "blip-2": ("blip_2", "Blip2ForConditionalGeneration"),
    "instructblip": ("instructblip", "InstructBlipForConditionalGeneration"),
    "git": ("git", "GitForCausalLM"),
    "qwen2_audio": ("qwen2_audio", "Qwen2AudioForConditionalGeneration"),
    "qwen2_vl": ("qwen2_vl", "Qwen2VLForConditionalGeneration"),
    "qwen3_vl": ("qwen3_vl", "Qwen3VLForConditionalGeneration"),
    "qwen3_vl_moe": ("qwen3_vl_moe", "Qwen3VLMoeForConditionalGeneration"),
    "glm4v": ("glm4v", "Glm4vForConditionalGeneration"),
    "glm4v_moe": ("glm4v_moe", "Glm4vMoeForConditionalGeneration"),
    "qwen2_5_vl": ("qwen2_5_vl", "Qwen2_5_VLForConditionalGeneration"),
    "blip": ("blip", "BlipForConditionalGeneration"),
    "paligemma": ("paligemma", "PaliGemmaForConditionalGeneration"),
    "colpali": ("colpali", "ColPaliForRetrieval"),
    "colqwen2": ("colqwen2", "ColQwen2ForRetrieval"),
    "gemma3": ("gemma3", "Gemma3ForConditionalGeneration"),
    "shieldgemma2": ("shieldgemma2", "ShieldGemma2ForImageClassification"),
}
MODEL_FOR_VISUAL_QUESTION_ANSWERING_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "blip": ("blip", "BlipForQuestionAnswering"),
}
MODEL_FOR_ZERO_SHOT_IMAGE_CLASSIFICATION_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "align": ("align", "AlignModel"),
    "altclip": ("altclip", "AltCLIPModel"),
    "chinese_clip": ("chinese_clip", "ChineseCLIPModel"),
    "clip": ("clip", "CLIPModel"),
    "metaclip_2": ("metaclip_2", "MetaClip2Model"),
    "groupvit": ("groupvit", "GroupViTModel"),
    "xclip": ("x_clip", "XCLIPModel"),
    "siglip": ("siglip", "SiglipModel"),
}


def _resolve(mapping: dict, model_type: str):
    if model_type not in mapping:
        raise KeyError(
            f"model_type {model_type!r} not registered for this auto class. "
            f"Known: {sorted(mapping)}"
        )
    module_name, class_name = mapping[model_type]
    module = importlib.import_module(f"transformers_tpu.models.{module_name}")
    return getattr(module, class_name)


class _BaseAutoModelClass:
    _model_mapping: dict[str, tuple[str, str]] = {}

    def __init__(self):
        raise OSError("Use from_pretrained / from_config on auto classes.")

    @classmethod
    def from_config(cls, config, **kwargs):
        model_cls = _resolve(cls._model_mapping, config.model_type)
        return model_cls(config, **kwargs)

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, **kwargs):
        config = kwargs.pop("config", None)
        trust_remote_code = kwargs.pop("trust_remote_code", None)
        if config is None:
            config = AutoConfig.from_pretrained(pretrained_model_name_or_path,
                                                trust_remote_code=trust_remote_code)
        # checkpoint-shipped custom code (reference auto_factory.py remote-code
        # route via dynamic_module_utils)
        if getattr(config, "auto_map", None) and cls.__name__ in config.auto_map:
            from ...dynamic_module_utils import load_custom_model_class

            custom = load_custom_model_class(config, pretrained_model_name_or_path,
                                             cls.__name__, trust_remote_code)
            if custom is not None:
                return custom.from_pretrained(pretrained_model_name_or_path, config=config, **kwargs)
        model_cls = _resolve(cls._model_mapping, config.model_type)
        return model_cls.from_pretrained(pretrained_model_name_or_path, config=config, **kwargs)

    @classmethod
    def register(cls, model_type: str, model_cls) -> None:
        module = model_cls.__module__.rsplit(".", 2)[-2]
        cls._model_mapping[model_type] = (module, model_cls.__name__)


class AutoModel(_BaseAutoModelClass):
    _model_mapping = MODEL_MAPPING_NAMES


class AutoModelForCausalLM(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_CAUSAL_LM_MAPPING_NAMES


class AutoModelForSequenceClassification(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_SEQUENCE_CLASSIFICATION_MAPPING_NAMES


class AutoModelForTokenClassification(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_TOKEN_CLASSIFICATION_MAPPING_NAMES


class AutoModelForQuestionAnswering(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_QUESTION_ANSWERING_MAPPING_NAMES


class AutoModelForMaskedLM(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_MASKED_LM_MAPPING_NAMES


class AutoModelForImageClassification(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_IMAGE_CLASSIFICATION_MAPPING_NAMES


class AutoModelForSeq2SeqLM(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_SEQ_TO_SEQ_CAUSAL_LM_MAPPING_NAMES


class AutoModelForSpeechSeq2Seq(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_SPEECH_SEQ_2_SEQ_MAPPING_NAMES


class AutoModelForVision2Seq(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_VISION_2_SEQ_MAPPING_NAMES


class AutoModelForImageTextToText(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_IMAGE_TEXT_TO_TEXT_MAPPING_NAMES


class AutoModelForVisualQuestionAnswering(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_VISUAL_QUESTION_ANSWERING_MAPPING_NAMES


class AutoModelForZeroShotImageClassification(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_ZERO_SHOT_IMAGE_CLASSIFICATION_MAPPING_NAMES


class AutoModelForZeroShotObjectDetection(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_ZERO_SHOT_OBJECT_DETECTION_MAPPING_NAMES


class AutoModelForVideoClassification(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_VIDEO_CLASSIFICATION_MAPPING_NAMES


class AutoModelForDepthEstimation(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_DEPTH_ESTIMATION_MAPPING_NAMES


class AutoModelForSemanticSegmentation(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_SEMANTIC_SEGMENTATION_MAPPING_NAMES


class AutoModelForObjectDetection(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_OBJECT_DETECTION_MAPPING_NAMES


class AutoModelForAudioClassification(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_AUDIO_CLASSIFICATION_MAPPING_NAMES


class AutoModelForCTC(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_CTC_MAPPING_NAMES


class AutoModelForDocumentQuestionAnswering(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_DOCUMENT_QUESTION_ANSWERING_MAPPING_NAMES


class AutoModelForKeypointDetection(_BaseAutoModelClass):
    _model_mapping = {"superpoint": ("superpoint", "SuperPointForKeypointDetection")}


class AutoModelForKeypointMatching(_BaseAutoModelClass):
    _model_mapping = {"superglue": ("superglue", "SuperGlueForKeypointMatching")}


class AutoModelForTextToWaveform(_BaseAutoModelClass):
    _model_mapping = {"vits": ("vits", "VitsModel"),
                      "bark": ("bark", "BarkModel")}


class AutoModelForTextToSpectrogram(_BaseAutoModelClass):
    _model_mapping = {"speecht5": ("speecht5", "SpeechT5ForTextToSpeech")}


class AutoModelForTableQuestionAnswering(_BaseAutoModelClass):
    _model_mapping = {"tapas": ("tapas", "TapasForQuestionAnswering")}


class AutoModelForTimeSeriesPrediction(_BaseAutoModelClass):
    _model_mapping = MODEL_FOR_TIME_SERIES_PREDICTION_MAPPING_NAMES
