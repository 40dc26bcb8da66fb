from . import vertex, trajectory, esdf
