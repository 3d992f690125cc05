from .transformer import TransformerBlock, TransformerEncoder  # noqa: F401
from .encoders import (  # noqa: F401
    MazeEncoder,
    StartGoalEncoder,
    MazeConditionEncoder,
    TextConditionEncoder,
)
from .denoisers import (  # noqa: F401
    KeypointDenoiser,
    InterpLevelDenoiser,
    timestep_embedding,
    continuous_time_embedding,
)
