from .commandline import __main__

__main__()
