from .cosmoprimo_tpu import CosmoprimoTPU
