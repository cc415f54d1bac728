from .cli.entrypoint import main

main()
