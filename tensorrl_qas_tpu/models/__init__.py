from tensorrl_qas_tpu.models.qnet import QNetwork
