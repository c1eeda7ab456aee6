from lizard_tpu.format.constants import *  # noqa: F401,F403
from lizard_tpu.format.levels import LEVELS, LevelParams, Parser, Codewords  # noqa: F401
