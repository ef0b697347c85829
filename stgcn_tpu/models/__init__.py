from stgcn_tpu.models.stgcn import DEFAULT_PLAN, PLAN_9, STGCN, STGCNConfig
