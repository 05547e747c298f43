from tensorrl_qas_tpu.tn.mps import MPS
from tensorrl_qas_tpu.tn.mpo import mpo_from_paulis
from tensorrl_qas_tpu.tn.dmrg import gs_dmrg, gs_exact_diag
from tensorrl_qas_tpu.tn.autodiff_gs import gs_autodiff
from tensorrl_qas_tpu.tn.stiefel import StiefelAdam, StiefelGD, StiefelMomentumGD
