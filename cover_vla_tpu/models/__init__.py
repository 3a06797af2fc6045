from cover_vla_tpu.models import gemma, siglip
from cover_vla_tpu.models import pi0
