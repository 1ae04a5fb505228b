"""Pure-NumPy math kernels used by the series operators.

These re-implement, from their published definitions, the handful of
scipy/sklearn routines the reference library leans on (scipy is not a
dependency of this engine): symmetric FIR windows, reflect-boundary
1-D convolution, not-a-knot cubic splines, PCHIP monotone interpolation,
linear interpolation with extrapolation, and 1-D Lloyd's k-means.
"""
