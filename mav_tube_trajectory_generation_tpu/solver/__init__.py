from . import structure, linear, qcqp, nonlinear
