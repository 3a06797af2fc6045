from cover_vla_tpu.serving import msgpack_numpy
from cover_vla_tpu.serving.policy_service import (
    WebsocketPolicyServer, WebsocketPolicyClient, BasePolicy)
from cover_vla_tpu.serving.policy_wrapper import (
    Pi0PolicyWrapper, CoVerPolicyWrapper)
