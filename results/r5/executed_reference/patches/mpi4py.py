"""Single-process mpi4py stub: enough surface for the reference's
utils/mpi_tools.py (Get_rank/Get_size/Allreduce/Bcast) to run without MPI."""
import numpy as np


class _Comm:
    def Get_rank(self):
        return 0

    def Get_size(self):
        return 1

    def Allreduce(self, send, recv, op=None):
        np.copyto(np.asarray(recv), np.asarray(send))

    def Bcast(self, buf, root=0):
        pass


class _MPI:
    COMM_WORLD = _Comm()
    SUM = "sum"
    MIN = "min"
    MAX = "max"


MPI = _MPI()
