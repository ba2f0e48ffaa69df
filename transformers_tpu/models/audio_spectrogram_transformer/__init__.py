from .modeling_audio_spectrogram_transformer import (ASTConfig,
                                                     ASTForAudioClassification,
                                                     ASTModel)
