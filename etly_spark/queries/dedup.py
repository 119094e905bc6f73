"""(populated in a later milestone)"""
