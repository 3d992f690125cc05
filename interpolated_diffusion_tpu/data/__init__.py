from .maze import generate_maze, sdf_from_occupancy  # noqa: F401
from .astar import astar  # noqa: F401
from .trajectories import grid_path_to_xy, resample_polyline, path_to_trajectory  # noqa: F401
from .dataset import ParticleMazeDataset, PreparedTrajectoryDataset, BatchLoader  # noqa: F401
