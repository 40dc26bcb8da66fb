from . import structure, linear, banded, qcqp, ipm, ipm_lanes, auto, nonlinear
