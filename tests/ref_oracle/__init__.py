# Shim packages (timm / mmdet / mmcv / torchvision / torch_scatter) that
# let the REAL reference code at /root/reference/team_code_transfuser be
# imported and executed on CPU as the parity oracle (VERDICT r2 Missing #1).
#
# This directory is NOT a python package dir for imports of the shims
# themselves; tests insert it into sys.path so that `import timm` etc.
# resolve here. See tests/test_reference_oracle.py.
