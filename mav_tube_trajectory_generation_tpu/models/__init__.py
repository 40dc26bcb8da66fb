from . import vertex, segment, trajectory, esdf
