from . import vertex, trajectory
