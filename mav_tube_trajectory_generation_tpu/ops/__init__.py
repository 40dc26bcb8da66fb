from . import basis, qmatrix, roots
