from .profile import (  # noqa: F401
    profile_transform,
    reconcile,
    users_from_customer,
)
