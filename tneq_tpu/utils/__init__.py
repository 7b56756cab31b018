from .config import (
    Configuration,
    AgentBehavior,
    GenerationProperty,
    EvolutionProperty,
    OverlordProperty,
    Experiment,
)
from .logging import setup_logger, setup_colored_logger, Colors
from .checkpoint import CheckpointManager

__all__ = [
    "Configuration",
    "AgentBehavior",
    "GenerationProperty",
    "EvolutionProperty",
    "OverlordProperty",
    "Experiment",
    "setup_logger",
    "setup_colored_logger",
    "Colors",
    "CheckpointManager",
]
