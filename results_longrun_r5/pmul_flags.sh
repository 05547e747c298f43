# A/B decision failed ('NoneType' object is not subscriptable); keeping defaults
