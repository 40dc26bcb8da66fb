from . import basis, qmatrix, roots, bezier
