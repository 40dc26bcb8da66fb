from . import structure, linear
