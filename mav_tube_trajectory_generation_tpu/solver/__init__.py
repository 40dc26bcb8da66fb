from . import structure, linear, banded, qcqp, ipm, nonlinear
