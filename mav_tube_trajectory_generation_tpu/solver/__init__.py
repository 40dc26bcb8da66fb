from . import structure, linear, qcqp, ipm, nonlinear
