from .modeling_openai import (OpenAIGPTConfig, OpenAIGPTLMHeadModel,
                              OpenAIGPTModel)
