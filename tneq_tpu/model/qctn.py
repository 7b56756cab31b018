class QCTN:  # placeholder, implemented next
    pass
