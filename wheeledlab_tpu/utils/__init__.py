from . import math  # noqa: F401
from .config import (  # noqa: F401
    RUN_CONFIGS, TASKS, Registry, apply_overrides, configclass,
    override, parse_cli_overrides, to_dict,
)
