from .config import (
    EngineConfigError,
    ModelConfig,
    PromptTemplate,
    ProviderConfig,
    default_config,
    group_templates,
    load_config,
    resolve_provider_params,
    save_config,
)
from .registry import EngineRegistry, REGISTRY, build_engine_stage
from .vlm_stub import StubVlmExtractor

__all__ = [
    "EngineConfigError",
    "ModelConfig",
    "PromptTemplate",
    "ProviderConfig",
    "default_config",
    "group_templates",
    "load_config",
    "resolve_provider_params",
    "save_config",
    "EngineRegistry",
    "REGISTRY",
    "build_engine_stage",
    "StubVlmExtractor",
]
