"""First-party rendering stack (replaces the reference's xgutils/vis/ fresnel
dependency); reference dotted paths resolve here via the xgutils.* alias."""
