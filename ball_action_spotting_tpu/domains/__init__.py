from ball_action_spotting_tpu.domains.base import Domain, PostprocessParams
from ball_action_spotting_tpu.domains import ball, action

DOMAINS = {
    "ball_action": ball.DOMAIN,
    "action": action.DOMAIN,
}


def get_domain(name: str) -> Domain:
    return DOMAINS[name]


__all__ = ["Domain", "PostprocessParams", "DOMAINS", "get_domain", "ball", "action"]
