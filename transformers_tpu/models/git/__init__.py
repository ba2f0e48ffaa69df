from .configuration_git import GitConfig, GitVisionConfig
from .modeling_git import GitForCausalLM, GitModel
from .processing_git import GitProcessor
