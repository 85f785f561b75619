"""Pure-numpy compute kernels used inside Ray Data batch/group transforms."""
