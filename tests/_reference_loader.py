import sys, types
from unittest.mock import MagicMock
import importlib.abc, importlib.util

STUB_ROOTS = ('pooch','tifffile','zarr','bioimageio','yacs','numba','torchinfo','timm','torchmetrics','pytorch_msssim','edt','fill_voids','skimage','imgaug','gdown','safetensors','nibabel','opencv_python','matplotlib_stub','xarray','torchvision','lpips','scipy_stub2')

class StubLoader(importlib.abc.Loader):
    def create_module(self, spec):
        class FakeModule(types.ModuleType):
            __path__ = []
            def __getattr__(self, name):
                if name.startswith('__'):
                    raise AttributeError(name)
                return MagicMock()
        return FakeModule(spec.name)
    def exec_module(self, module):
        pass

class StubFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path, target=None):
        root = fullname.split('.')[0]
        if root in STUB_ROOTS:
            try:
                for finder in sys.meta_path[1:]:
                    try:
                        spec = finder.find_spec(fullname, path, target)
                        if spec: return None
                    except Exception: pass
                return importlib.util.spec_from_loader(fullname, StubLoader(), is_package=True)
            except Exception:
                return importlib.util.spec_from_loader(fullname, StubLoader(), is_package=True)
        return None

sys.meta_path.insert(0, StubFinder())
import yacs.config
yacs.config.CfgNode = dict
import numba
numba.njit = lambda *a,**k: (a[0] if a and callable(a[0]) else (lambda f: f))
numba.prange = range
sys.path.insert(0, '/root/reference'); sys.path.insert(0, '/root/repo')

def load_ref(relpath, name):
    spec = importlib.util.spec_from_file_location(name, '/root/reference/' + relpath)
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m
